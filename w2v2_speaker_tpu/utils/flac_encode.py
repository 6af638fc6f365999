"""Minimal-but-conformant FLAC encoder (pure Python).

Exists to (a) generate spec-conformant test vectors that exercise every
decode path of native/flac.cpp — constant / verbatim / fixed / LPC
subframes, Rice partitions + escape codes, wasted bits, stereo
decorrelation modes — and (b) provide a dependency-free archival encoder
for shard tooling. FLAC is lossless, so `decode(encode(x)) == x` holds
bit-exactly regardless of how well the predictors compress, which makes
round-trip testing of the decoder airtight.

Format reference: the public FLAC format spec (RFC 9639); behavioral
parity target is the reference repo's torchaudio/libsndfile read path
(src/data/modules/speech/librispeech.py:662-804).
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional

import numpy as np

__all__ = ["encode_flac", "write_flac"]


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_coded(n: int) -> bytes:
    """UTF-8-style coded frame number (RFC 9639 §9.1.5)."""
    if n < 0x80:
        return bytes([n])
    # nbytes-byte form carries (7 - nbytes) + 6*(nbytes-1) payload bits
    for nbytes in range(2, 8):
        if n.bit_length() <= (7 - nbytes) + 6 * (nbytes - 1):
            break
    shift = 6 * (nbytes - 1)
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | (n >> shift)
    out = [lead]
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_cost(res: np.ndarray, param: int) -> int:
    u = (np.abs(res.astype(np.int64)) * 2 - (res < 0)).astype(np.int64)
    return int(np.sum(u >> param)) + len(res) * (param + 1)


def _best_rice_param(res: np.ndarray) -> int:
    """Best rice parameter near the log2-mean guess; values >= 15 signal
    the caller to use an escape (raw) partition instead."""
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res.astype(np.int64)))) + 1e-9
    guess = min(30, max(0, int(np.log2(mean + 1))))
    best, best_cost = 0, None
    for p in range(max(0, guess - 2), min(30, guess + 3) + 1):
        c = _rice_cost(res, p)
        if best_cost is None or c < best_cost:
            best, best_cost = p, c
    return best


def _write_residual(bw: BitWriter, res: np.ndarray, pred_order: int,
                    blocksize: int, partition_order: int):
    bw.write(0, 2)  # method 0: 4-bit rice params
    bw.write(partition_order, 4)
    parts = 1 << partition_order
    idx = 0
    for part in range(parts):
        count = (blocksize >> partition_order) - (pred_order if part == 0 else 0)
        chunk = res[idx: idx + count]
        idx += count
        param = _best_rice_param(chunk)
        if param >= 15:  # escape: raw n-bit residuals (rare; exercised in tests)
            rawbits = max(
                (int(np.max(np.abs(chunk))) if len(chunk) else 0).bit_length()
                + 1,
                1,
            )
            bw.write(0xF, 4)
            bw.write(rawbits, 5)
            for v in chunk:
                bw.write_signed(int(v), rawbits)
            continue
        bw.write(param, 4)
        for v in chunk:
            v = int(v)
            u = (abs(v) << 1) - (1 if v < 0 else 0)
            bw.write_unary(u >> param)
            bw.write(u & ((1 << param) - 1), param)


_FIXED_COEF = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]]


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_analyze(x: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin -> quantized integer coefficients (coefs, shift)."""
    xf = x.astype(np.float64)
    if len(xf) <= order or np.allclose(xf, 0):
        return None
    # autocorrelation with a welch-ish window for stability
    n = len(xf)
    w = 1.0 - ((np.arange(n) - (n - 1) / 2) / ((n + 1) / 2)) ** 2
    xw = xf * w
    ac = np.array([np.dot(xw[: n - k], xw[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        k = acc / err
        a[i] = k
        a[:i] = a[:i] - k * a[:i][::-1]
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = np.max(np.abs(a))
    if cmax == 0:
        return None
    shift = min(15, max(1, precision - 1 - int(np.ceil(np.log2(cmax + 1e-9)))))
    q = np.clip(
        np.round(a * (1 << shift)),
        -(1 << (precision - 1)),
        (1 << (precision - 1)) - 1,
    ).astype(np.int64)
    if np.all(q == 0):
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, coefs: np.ndarray, shift: int) -> np.ndarray:
    order = len(coefs)
    xi = x.astype(np.int64)
    # pred[i] = sum_j coef[j] * x[i-1-j] >> shift, for i >= order
    acc = np.zeros(len(xi) - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        acc += c * xi[order - 1 - j: len(xi) - 1 - j]
    return xi[order:] - (acc >> shift)


def _wasted_bits(x: np.ndarray) -> int:
    """Shared trailing-zero count across the block (0 if any sample is 0-odd
    mix); capped so constant-0 blocks stay CONSTANT."""
    nz = x[x != 0]
    if len(nz) == 0:
        return 0
    w = 0
    while w < 8 and not np.any(nz & (1 << w)):
        w += 1
    return w


def _encode_subframe(bw: BitWriter, x: np.ndarray, bps: int,
                     partition_order: int, force: Optional[str],
                     lpc_order: int, use_wasted: bool = False):
    wasted = _wasted_bits(x) if use_wasted else 0
    if wasted:
        x = x >> wasted
        bps -= wasted

    def header(type_code: int):
        bw.write(0, 1)
        bw.write(type_code, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if force != "verbatim" and np.all(x == x[0]):
        header(0)  # CONSTANT
        bw.write_signed(int(x[0]), bps)
        return
    if force == "verbatim":
        header(1)
        for v in x:
            bw.write_signed(int(v), bps)
        return
    if force == "lpc" or (force is None and lpc_order > 0):
        lp = _lpc_analyze(x, lpc_order)
        if lp is not None:
            coefs, shift = lp
            res = _lpc_residual(x, coefs, shift)
            header(0x20 | (len(coefs) - 1))
            for v in x[: len(coefs)]:
                bw.write_signed(int(v), bps)
            bw.write(12 - 1, 4)  # precision code = precision - 1
            bw.write_signed(shift, 5)
            for c in coefs:
                bw.write_signed(int(c), 12)
            _write_residual(bw, res, len(coefs), len(x), partition_order)
            return
    # fixed predictor: pick the order with the smallest |residual| sum
    best_order, best_res, best_cost = 0, None, None
    for order in range(5):
        if len(x) <= order:
            break
        res = _fixed_residual(x, order)
        if np.any(np.abs(res) > (1 << 30)):
            continue
        cost = float(np.sum(np.abs(res)))
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    header(0x08 | best_order)
    for v in x[:best_order]:
        bw.write_signed(int(v), bps)
    _write_residual(bw, best_res, best_order, len(x), partition_order)


def encode_flac(
    pcm: np.ndarray,  # [T] or [T, C] integer PCM
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 4096,
    partition_order: int = 0,
    force_subframe: Optional[str] = None,  # None|"verbatim"|"lpc"
    lpc_order: int = 8,
    stereo_mode: str = "independent",  # |"left_side"|"right_side"|"mid_side"
    use_wasted_bits: bool = False,
) -> bytes:
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    total, channels = pcm.shape
    assert channels in (1, 2)
    lim = 1 << (bps - 1)
    assert pcm.min() >= -lim and pcm.max() < lim, "PCM exceeds bit depth"

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    md5 = hashlib.md5()
    le = pcm.astype("<i2" if bps <= 16 else "<i4")
    md5.update(le.tobytes())
    si = BitWriter()
    si.write(blocksize, 16)  # min blocksize
    si.write(blocksize, 16)  # max
    si.write(0, 24)          # min framesize unknown
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + md5.digest()
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    sr_code = {88200: 0x1, 176400: 0x2, 192000: 0x3, 8000: 0x4, 16000: 0x5,
               22050: 0x6, 24000: 0x7, 32000: 0x8, 44100: 0x9, 48000: 0xA,
               96000: 0xB}.get(sample_rate, 13)
    sz_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]

    frame_idx = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        block = pcm[pos: pos + n].astype(np.int64)
        pos += n
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bs_code = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8,
                   512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13,
                   16384: 14, 32768: 15}.get(n, 7)
        bw.write(bs_code, 4)
        bw.write(sr_code, 4)
        chans: List[np.ndarray]
        sub_bps: List[int]
        if channels == 2 and stereo_mode != "independent":
            left, right = block[:, 0], block[:, 1]
            side = left - right
            if stereo_mode == "left_side":
                bw.write(8, 4); chans = [left, side]; sub_bps = [bps, bps + 1]
            elif stereo_mode == "right_side":
                bw.write(9, 4); chans = [side, right]; sub_bps = [bps + 1, bps]
            else:  # mid_side
                mid = (left + right) >> 1
                bw.write(10, 4); chans = [mid, side]; sub_bps = [bps, bps + 1]
        else:
            bw.write(channels - 1, 4)
            chans = [block[:, c] for c in range(channels)]
            sub_bps = [bps] * channels
        bw.write(sz_code, 3)
        bw.write(0, 1)  # reserved
        for b in _utf8_coded(frame_idx):
            bw.write(b, 8)
        if sr_code == 13:
            bw.write(sample_rate, 16)
        if bs_code == 7:
            bw.write(n - 1, 16)
        hdr = bw.out[:]  # bytes so far (header is byte-aligned here)
        assert bw.nbits == 0
        bw.write(_crc8(bytes(hdr)), 8)
        po = partition_order
        if n % (1 << po) or (n >> po) <= 32:
            po = 0
        for x, sb in zip(chans, sub_bps):
            _encode_subframe(bw, x, sb, po, force_subframe, lpc_order,
                             use_wasted=use_wasted_bits)
        bw.align()
        frame_body = bytes(bw.out)
        bw.write(_crc16(frame_body), 16)
        out += bw.bytes()
        frame_idx += 1
    return bytes(out)


def write_flac(path, pcm, **kw):
    data = encode_flac(pcm, **kw)
    with open(path, "wb") as f:
        f.write(data)
