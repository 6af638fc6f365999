"""Native FLAC decoder (native/flac.cpp) round-trip tests.

FLAC is lossless, so decode(encode(x)) == x bit-exactly for ANY conformant
encoder — the pure-Python encoder (utils/flac_encode.py) is steered through
every subframe type / residual coding / channel mode to exercise each
decode path. Behavioral parity target: the reference's torchaudio read of
LibriSpeech .flac (src/data/modules/speech/librispeech.py:662-804).
"""

import numpy as np
import pytest

from w2v2_speaker_tpu.utils import flac as nflac
from w2v2_speaker_tpu.utils.flac_encode import encode_flac

pytestmark = pytest.mark.skipif(
    not nflac.available(), reason="native FLAC lib not buildable"
)


def _speechy(n=20011, seed=0, amp=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(t * 0.03) + rng.normal(0, amp / 4, n)
    return np.clip(x, -32768, 32767).astype(np.int32)


def _roundtrip(tmp_path, pcm, **kw):
    p = tmp_path / "t.flac"
    p.write_bytes(encode_flac(pcm, **kw))
    got, sr = nflac.read_flac(p, dtype=np.int32)
    assert sr == kw.get("sample_rate", 16000)
    np.testing.assert_array_equal(got, pcm)
    return p


@pytest.mark.parametrize(
    "kw",
    [
        {},  # mixed constant/fixed/LPC, default blocksize
        {"force_subframe": "verbatim"},
        {"force_subframe": "lpc", "lpc_order": 12},
        {"lpc_order": 0},  # fixed predictors only
        {"partition_order": 4},  # 16 rice partitions
        {"blocksize": 512},  # many frames -> multi-byte UTF-8 frame numbers
        {"use_wasted_bits": True},
    ],
)
def test_roundtrip_mono16(tmp_path, kw):
    x = _speechy()
    if kw.get("use_wasted_bits"):
        x = (x >> 2) << 2  # force 2 shared trailing-zero bits
    _roundtrip(tmp_path, x, **kw)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_modes(tmp_path, mode):
    x = _speechy()
    st = np.stack([x, np.roll(x, 3) + 17], 1).astype(np.int32)
    p = tmp_path / "t.flac"
    p.write_bytes(encode_flac(st, stereo_mode=mode))
    got, _ = nflac.read_flac(p, dtype=np.int32)
    np.testing.assert_array_equal(got, st)


def test_roundtrip_24bit(tmp_path):
    x = (_speechy().astype(np.int64) * 200).astype(np.int32)  # ~23 bits
    _roundtrip(tmp_path, x, bps=24)


def test_roundtrip_8bit(tmp_path):
    x = np.clip(_speechy() // 256, -128, 127).astype(np.int32)
    _roundtrip(tmp_path, x, bps=8)


def test_escape_partitions(tmp_path):
    # white noise at near-full-scale makes rice params blow past 14 -> the
    # encoder falls back to escape-coded raw partitions
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, 8192).astype(np.int32)
    _roundtrip(tmp_path, x, force_subframe="verbatim")
    _roundtrip(tmp_path, x)  # fixed-predictor residuals, huge variance


def test_constant_blocks(tmp_path):
    x = np.full(9000, -1234, np.int32)
    _roundtrip(tmp_path, x)


def test_float_scaling_matches_torchaudio_semantics(tmp_path):
    x = _speechy()
    p = tmp_path / "t.flac"
    p.write_bytes(encode_flac(x))
    f, sr = nflac.read_flac(p)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f, x.astype(np.float32) / 32768.0, rtol=0, atol=0)


def test_probe(tmp_path):
    x = _speechy(4096)
    data = encode_flac(x, sample_rate=16000)
    total, ch, sr, bps = nflac.probe(data)
    assert (total, ch, sr, bps) == (4096, 1, 16000, 16)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="bad magic"):
        nflac.probe(b"RIFFxxxxWAVE" + b"\0" * 64)


def test_read_audio_dispatches_flac(tmp_path):
    from w2v2_speaker_tpu.data.io import load_raw_audio, read_audio

    x = _speechy()
    p = tmp_path / "utt.flac"
    p.write_bytes(encode_flac(x))
    w, sr = read_audio(p)
    assert sr == 16000 and w.dtype == np.float32
    # the 16 kHz guard path also accepts flac now
    w2 = load_raw_audio(p)
    np.testing.assert_array_equal(w, w2)


def test_librispeech_discovery_includes_flac(tmp_path):
    from w2v2_speaker_tpu.data.librispeech import _discover_transcribed_wavs

    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    (d / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD\n19-198-0001 SECOND UTTERANCE\n"
    )
    (d / "19-198-0000.flac").write_bytes(encode_flac(_speechy(5000)))
    (d / "19-198-0001.flac").write_bytes(encode_flac(_speechy(6000, seed=2)))
    entries = _discover_transcribed_wavs(tmp_path)
    assert [e["key"] for e in entries] == ["19-198-0000", "19-198-0001"]
    assert entries[0]["transcription"] == "HELLO WORLD"


# ---------------------------------------------------------------------------
# Corrupt / adversarial stream handling (advisor round-2 findings)
# ---------------------------------------------------------------------------


def _craft_underflow_stream(n_filler_bits=50_000):
    """A valid-headered mono/16-bit stream whose single frame declares
    blocksize 2 but an LPC subframe of order 32.

    Before the fix, read_residual computed the partition sample count as
    (blocksize >> porder) - pred_order in uint32, underflowing to ~4.29e9
    and writing residuals far past the decoder's per-channel buffer
    (memory corruption from a file whose frame-header CRC-8 is valid).
    """
    from w2v2_speaker_tpu.utils import flac_encode as fe

    out = bytearray(b"fLaC")
    si = fe.BitWriter()
    si.write(2, 16)  # min blocksize
    si.write(2, 16)  # max blocksize
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(0, 3)  # 1 channel
    si.write(15, 5)  # 16 bps
    si.write(1000, 36)
    body = si.bytes() + b"\x00" * 16  # dummy md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    bw = fe.BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(6, 4)  # blocksize: 8-bit value follows
    bw.write(5, 4)  # 16 kHz
    bw.write(0, 4)  # 1 channel
    bw.write(4, 3)  # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)  # coded frame number 0
    bw.write(1, 8)  # blocksize - 1  ->  blocksize 2
    hdr = bytes(bw.out)
    assert bw.nbits == 0
    bw.write(fe._crc8(hdr), 8)  # header CRC passes
    # LPC subframe, order 32 (> blocksize)
    bw.write(0, 1)
    bw.write(0x3F, 6)
    bw.write(0, 1)
    for _ in range(32):
        bw.write_signed(0, 16)  # warmup
    bw.write(11, 4)  # precision - 1
    bw.write_signed(0, 5)  # shift
    for _ in range(32):
        bw.write_signed(0, 12)  # coefficients
    # residual: rice method 0, partition order 0, param 0, then a long run
    # of unary-coded zero residuals the old count-underflow would consume
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(0, 4)
    for _ in range(n_filler_bits):
        bw.write(1, 1)
    bw.align()
    bw.write(fe._crc16(bytes(bw.out)), 16)
    out += bw.bytes()
    return bytes(out)


def test_predictor_order_exceeding_blocksize_rejected(tmp_path):
    p = tmp_path / "evil.flac"
    p.write_bytes(_craft_underflow_stream())
    with pytest.raises(ValueError, match="malformed subframe"):
        nflac.read_flac(p)


def test_frame_crc16_verified(tmp_path):
    # Flip one bit inside verbatim sample data: structurally still a valid
    # frame, so only the whole-frame CRC-16 check can catch it.
    data = bytearray(
        encode_flac(_speechy(64), blocksize=64, force_subframe="verbatim")
    )
    frames_start = 4 + 4 + 34  # fLaC + block header + STREAMINFO
    data[frames_start + 20] ^= 0x10
    p = tmp_path / "bitflip.flac"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="CRC mismatch"):
        nflac.read_flac(p)


def test_unknown_total_samples_grows_buffer(tmp_path):
    # Constant-subframe streams decode far more samples per byte than the
    # len(data)*8/bps capacity heuristic assumes; with STREAMINFO
    # total_samples zeroed (legal: 0 = unknown) decode must retry with a
    # grown buffer rather than fail with -9.
    n = 300_000
    data = bytearray(encode_flac(np.zeros(n, dtype=np.int32)))
    # STREAMINFO total_samples: bits 108..144 of the 34-byte body at offset 8
    body = 8
    data[body + 13] &= 0xF0
    data[body + 14 : body + 18] = b"\x00\x00\x00\x00"
    p = tmp_path / "unknown_total.flac"
    p.write_bytes(bytes(data))
    total, ch, sr, bps = nflac.probe(bytes(data))
    assert total == 0  # the field really was cleared
    got, sr = nflac.read_flac(p, dtype=np.int32)
    assert got.shape == (n,)
    assert not got.any()


def test_bitflip_fuzz_never_crashes(tmp_path):
    """Corpus-mutation fuzz: random bit flips anywhere in a valid stream
    must decode or raise — never corrupt memory (the round-2 advisor found
    an OOB write reachable from a crafted frame; the residual/order guards
    + whole-frame CRC-16 now front-stop this class)."""
    rng = np.random.default_rng(0)
    streams = []
    for ch, n, bs in [(1, 6000, 1024), (2, 5000, 256)]:
        pcm = (rng.normal(size=(n, ch)) * 8000).astype(np.int16)
        streams.append(
            np.frombuffer(
                encode_flac(pcm, sample_rate=16000, blocksize=bs), np.uint8
            ).copy()
        )
    p = tmp_path / "fuzz.flac"
    decoded = rejected = 0
    for arr in streams:
        for _ in range(120):
            m = arr.copy()
            for _ in range(int(rng.integers(1, 9))):
                i = int(rng.integers(0, len(m)))
                m[i] ^= 1 << int(rng.integers(0, 8))
            p.write_bytes(m.tobytes())
            try:
                nflac.read_flac(p)
                decoded += 1
            except ValueError:
                rejected += 1
    assert decoded + rejected == 240
    assert rejected > 200  # CRC-16 must be doing the front-stopping
