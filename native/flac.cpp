// FLAC decoder (native, no external deps).
//
// TPU-native replacement for the reference's torchaudio/libsndfile FLAC
// path (reference streams LibriSpeech .flac via torchaudio,
// src/data/modules/speech/librispeech.py:662-804). Host-side decode is the
// data-pipeline bottleneck for speech training, so the bit-reader + LPC
// reconstruction live in C++ (the inner loops are inherently sequential and
// unvectorizable in numpy); Python binds via ctypes (utils/flac.py).
//
// Supports the full decode side of the format as used by the `flac`
// reference encoder: constant / verbatim / fixed(0-4) / LPC(1-32)
// subframes, Rice residual methods 0 and 1 with escape partitions, wasted
// bits, all inter-channel decorrelation modes, 8/12/16/20/24-bit depths,
// both blocking strategies. CRC-8 of frame headers AND CRC-16 of whole
// frames are verified; frames with bad sync or CRC abort with an error
// code (no resync heuristics). Malformed structure (e.g. predictor order
// exceeding the partition size) is rejected before any buffer writes, so
// corrupt or malicious files fail cleanly instead of corrupting memory.

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t size;     // bytes
  int64_t pos;      // byte position
  uint64_t buf;     // bit buffer, MSB-aligned consumption
  int bits;         // valid bits in buf

  void init(const uint8_t* d, int64_t n) {
    data = d; size = n; pos = 0; buf = 0; bits = 0;
  }
  bool fill() {
    while (bits <= 56 && pos < size) {
      buf = (buf << 8) | data[pos++];
      bits += 8;
    }
    return bits > 0;
  }
  // read n bits (n <= 32) as unsigned; returns false on EOF
  bool read(int n, uint32_t* out) {
    if (n == 0) { *out = 0; return true; }
    if (bits < n && !fill()) return false;
    if (bits < n) return false;
    *out = (uint32_t)((buf >> (bits - n)) & ((n == 64) ? ~0ull : ((1ull << n) - 1)));
    bits -= n;
    buf &= (bits == 64) ? ~0ull : ((1ull << bits) - 1);
    return true;
  }
  bool read_signed(int n, int32_t* out) {
    uint32_t u;
    if (!read(n, &u)) return false;
    // sign-extend
    if (n < 32 && (u & (1u << (n - 1)))) u |= ~((1u << n) - 1);
    *out = (int32_t)u;
    return true;
  }
  // count leading zeros then consume the terminating 1 bit
  bool read_unary(uint32_t* out) {
    uint32_t q = 0;
    for (;;) {
      if (bits == 0 && !fill()) return false;
      // scan the buffered bits
      while (bits > 0) {
        uint64_t top = (buf >> (bits - 1)) & 1u;
        bits--;
        buf &= (bits == 64) ? ~0ull : ((1ull << bits) - 1);
        if (top) { *out = q; return true; }
        q++;
        if (q > 1u << 24) return false;  // corrupt stream guard
      }
    }
  }
  bool align_byte() {
    int drop = bits & 7;
    uint32_t dummy;
    return drop == 0 || read(drop, &dummy);
  }
  int64_t byte_pos() const { return pos - bits / 8; }
};

const uint8_t kCrc8Table[256] = {
  0x00,0x07,0x0e,0x09,0x1c,0x1b,0x12,0x15,0x38,0x3f,0x36,0x31,0x24,0x23,0x2a,0x2d,
  0x70,0x77,0x7e,0x79,0x6c,0x6b,0x62,0x65,0x48,0x4f,0x46,0x41,0x54,0x53,0x5a,0x5d,
  0xe0,0xe7,0xee,0xe9,0xfc,0xfb,0xf2,0xf5,0xd8,0xdf,0xd6,0xd1,0xc4,0xc3,0xca,0xcd,
  0x90,0x97,0x9e,0x99,0x8c,0x8b,0x82,0x85,0xa8,0xaf,0xa6,0xa1,0xb4,0xb3,0xba,0xbd,
  0xc7,0xc0,0xc9,0xce,0xdb,0xdc,0xd5,0xd2,0xff,0xf8,0xf1,0xf6,0xe3,0xe4,0xed,0xea,
  0xb7,0xb0,0xb9,0xbe,0xab,0xac,0xa5,0xa2,0x8f,0x88,0x81,0x86,0x93,0x94,0x9d,0x9a,
  0x27,0x20,0x29,0x2e,0x3b,0x3c,0x35,0x32,0x1f,0x18,0x11,0x16,0x03,0x04,0x0d,0x0a,
  0x57,0x50,0x59,0x5e,0x4b,0x4c,0x45,0x42,0x6f,0x68,0x61,0x66,0x73,0x74,0x7d,0x7a,
  0x89,0x8e,0x87,0x80,0x95,0x92,0x9b,0x9c,0xb1,0xb6,0xbf,0xb8,0xad,0xaa,0xa3,0xa4,
  0xf9,0xfe,0xf7,0xf0,0xe5,0xe2,0xeb,0xec,0xc1,0xc6,0xcf,0xc8,0xdd,0xda,0xd3,0xd4,
  0x69,0x6e,0x67,0x60,0x75,0x72,0x7b,0x7c,0x51,0x56,0x5f,0x58,0x4d,0x4a,0x43,0x44,
  0x19,0x1e,0x17,0x10,0x05,0x02,0x0b,0x0c,0x21,0x26,0x2f,0x28,0x3d,0x3a,0x33,0x34,
  0x4e,0x49,0x40,0x47,0x52,0x55,0x5c,0x5b,0x76,0x71,0x78,0x7f,0x6a,0x6d,0x64,0x63,
  0x3e,0x39,0x30,0x37,0x22,0x25,0x2c,0x2b,0x06,0x01,0x08,0x0f,0x1a,0x1d,0x14,0x13,
  0xae,0xa9,0xa0,0xa7,0xb2,0xb5,0xbc,0xbb,0x96,0x91,0x98,0x9f,0x8a,0x8d,0x84,0x83,
  0xde,0xd9,0xd0,0xd7,0xc2,0xc5,0xcc,0xcb,0xe6,0xe1,0xe8,0xef,0xfa,0xfd,0xf4,0xf3,
};

uint8_t crc8(const uint8_t* d, int64_t n) {
  uint8_t c = 0;
  for (int64_t i = 0; i < n; i++) c = kCrc8Table[c ^ d[i]];
  return c;
}

// CRC-16 (poly 0x8005, init 0) over the whole frame, per the FLAC spec.
uint16_t crc16(const uint8_t* d, int64_t n) {
  static const struct Table {
    uint16_t t[256];
    Table() {
      for (int i = 0; i < 256; i++) {
        uint16_t c = (uint16_t)(i << 8);
        for (int j = 0; j < 8; j++)
          c = (c & 0x8000) ? (uint16_t)((c << 1) ^ 0x8005) : (uint16_t)(c << 1);
        t[i] = c;
      }
    }
  } tbl;
  uint16_t c = 0;
  for (int64_t i = 0; i < n; i++)
    c = (uint16_t)((c << 8) ^ tbl.t[((c >> 8) ^ d[i]) & 0xff]);
  return c;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bps = 0;
  uint64_t total_samples = 0;  // per channel; 0 = unknown
  int64_t frames_start = 0;    // byte offset of first audio frame
};

// Parse "fLaC" + metadata blocks; fills si. Returns 0 on success.
int parse_header(const uint8_t* data, int64_t n, StreamInfo* si) {
  if (n < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
  int64_t p = 4;
  bool last = false;
  bool have_si = false;
  while (!last) {
    if (p + 4 > n) return -2;
    last = data[p] & 0x80;
    int type = data[p] & 0x7f;
    uint32_t len = ((uint32_t)data[p + 1] << 16) | ((uint32_t)data[p + 2] << 8)
                   | data[p + 3];
    p += 4;
    if (p + len > n) return -2;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* b = data + p;
      si->sample_rate = ((uint32_t)b[10] << 12) | ((uint32_t)b[11] << 4)
                        | (b[12] >> 4);
      si->channels = ((b[12] >> 1) & 0x7) + 1;
      si->bps = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
      si->total_samples = (((uint64_t)(b[13] & 0xf)) << 32)
                          | ((uint64_t)b[14] << 24) | ((uint64_t)b[15] << 16)
                          | ((uint64_t)b[16] << 8) | b[17];
      have_si = true;
    }
    p += len;
  }
  if (!have_si) return -3;
  si->frames_start = p;
  return 0;
}

// UTF-8-style coded number (frame/sample index); up to 36 bits (56 for
// sample numbers). Returns false on malformed coding.
bool read_coded_number(BitReader* br, uint64_t* out) {
  uint32_t b0;
  if (!br->read(8, &b0)) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) { *out = b0; return true; }
  else if ((b0 & 0xe0) == 0xc0) { extra = 1; v = b0 & 0x1f; }
  else if ((b0 & 0xf0) == 0xe0) { extra = 2; v = b0 & 0x0f; }
  else if ((b0 & 0xf8) == 0xf0) { extra = 3; v = b0 & 0x07; }
  else if ((b0 & 0xfc) == 0xf8) { extra = 4; v = b0 & 0x03; }
  else if ((b0 & 0xfe) == 0xfc) { extra = 5; v = b0 & 0x01; }
  else if (b0 == 0xfe) { extra = 6; v = 0; }
  else return false;
  for (int i = 0; i < extra; i++) {
    uint32_t b;
    if (!br->read(8, &b)) return false;
    if ((b & 0xc0) != 0x80) return false;
    v = (v << 6) | (b & 0x3f);
  }
  *out = v;
  return true;
}

// Rice / escape residual into res[0 .. blocksize-pred_order)
bool read_residual(BitReader* br, uint32_t blocksize, uint32_t pred_order,
                   int32_t* res) {
  uint32_t method;
  if (!br->read(2, &method)) return false;
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t esc = method == 0 ? 0xf : 0x1f;
  uint32_t porder;
  if (!br->read(4, &porder)) return false;
  uint32_t partitions = 1u << porder;
  // The first partition holds (blocksize >> porder) - pred_order samples;
  // reject any frame where that would underflow REGARDLESS of partition
  // count (a crafted blocksize < pred_order would otherwise wrap the
  // uint32 count and overflow the caller's sample buffer). Multi-partition
  // frames additionally require even divisibility and a non-empty first
  // partition, per the spec.
  if (pred_order > (blocksize >> porder)) return false;
  if (partitions > 1 &&
      (blocksize % partitions || blocksize >> porder <= pred_order))
    return false;
  uint32_t idx = 0;
  for (uint32_t part = 0; part < partitions; part++) {
    uint32_t count = (blocksize >> porder) - (part == 0 ? pred_order : 0);
    uint32_t param;
    if (!br->read(pbits, &param)) return false;
    if (param == esc) {
      uint32_t rawbits;
      if (!br->read(5, &rawbits)) return false;
      for (uint32_t i = 0; i < count; i++) {
        int32_t s = 0;
        if (rawbits && !br->read_signed(rawbits, &s)) return false;
        res[idx++] = s;
      }
    } else {
      for (uint32_t i = 0; i < count; i++) {
        uint32_t q, r = 0;
        if (!br->read_unary(&q)) return false;
        if (param && !br->read(param, &r)) return false;
        uint32_t u = (q << param) | r;
        res[idx++] = (int32_t)(u >> 1) ^ -(int32_t)(u & 1);  // unzigzag
      }
    }
  }
  return true;
}

const int32_t kFixedCoef[5][4] = {
    {},            // order 0
    {1},           // x[i-1]
    {2, -1},       // 2x[i-1] - x[i-2]
    {3, -3, 1},
    {4, -6, 4, -1},
};

bool decode_subframe(BitReader* br, uint32_t blocksize, uint32_t bps,
                     int32_t* out) {
  uint32_t pad, type, wasted = 0;
  if (!br->read(1, &pad) || pad) return false;
  if (!br->read(6, &type)) return false;
  uint32_t has_wasted;
  if (!br->read(1, &has_wasted)) return false;
  if (has_wasted) {
    uint32_t q;
    if (!br->read_unary(&q)) return false;
    wasted = q + 1;
    if (wasted >= bps) return false;
  }
  uint32_t ebps = bps - wasted;

  if (type == 0) {  // CONSTANT
    int32_t v;
    if (!br->read_signed(ebps, &v)) return false;
    for (uint32_t i = 0; i < blocksize; i++) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < blocksize; i++)
      if (!br->read_signed(ebps, &out[i])) return false;
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    uint32_t order = type & 0x07;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; i++)
      if (!br->read_signed(ebps, &out[i])) return false;
    if (!read_residual(br, blocksize, order, out + order)) return false;
    const int32_t* c = kFixedCoef[order];
    for (uint32_t i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (uint32_t j = 0; j < order; j++) pred += (int64_t)c[j] * out[i - 1 - j];
      out[i] += (int32_t)pred;
    }
  } else if (type & 0x20) {  // LPC
    uint32_t order = (type & 0x1f) + 1;
    if (order > blocksize) return false;
    for (uint32_t i = 0; i < order; i++)
      if (!br->read_signed(ebps, &out[i])) return false;
    uint32_t prec;
    if (!br->read(4, &prec)) return false;
    if (prec == 0xf) return false;
    prec += 1;
    int32_t shift;
    if (!br->read_signed(5, &shift)) return false;
    if (shift < 0) return false;
    int32_t coef[32];
    for (uint32_t i = 0; i < order; i++)
      if (!br->read_signed(prec, &coef[i])) return false;
    if (!read_residual(br, blocksize, order, out + order)) return false;
    for (uint32_t i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (uint32_t j = 0; j < order; j++)
        pred += (int64_t)coef[j] * out[i - 1 - j];
      out[i] += (int32_t)(pred >> shift);
    }
  } else {
    return false;  // reserved subframe type
  }

  if (wasted)
    for (uint32_t i = 0; i < blocksize; i++) out[i] <<= wasted;
  return true;
}

}  // namespace

extern "C" {

// Probe stream parameters. Returns 0 on success.
int w2vtpu_flac_probe(const uint8_t* data, int64_t n,
                      int64_t* total_samples, int32_t* channels,
                      int32_t* sample_rate, int32_t* bps) {
  StreamInfo si;
  int rc = parse_header(data, n, &si);
  if (rc) return rc;
  *total_samples = (int64_t)si.total_samples;
  *channels = (int32_t)si.channels;
  *sample_rate = (int32_t)si.sample_rate;
  *bps = (int32_t)si.bps;
  return 0;
}

// Decode the whole stream into `out` (interleaved int32, capacity =
// max_frames * channels). Writes the per-channel sample count to
// *frames_written. Returns 0 on success, negative error codes otherwise.
int w2vtpu_flac_decode(const uint8_t* data, int64_t n, int32_t* out,
                       int64_t max_frames, int64_t* frames_written) {
  StreamInfo si;
  int rc = parse_header(data, n, &si);
  if (rc) return rc;
  if (si.channels == 0 || si.channels > 8 || si.bps == 0 || si.bps > 32)
    return -4;

  BitReader br;
  br.init(data, n);
  br.pos = si.frames_start;

  // per-channel scratch for one frame (max legal blocksize 65535)
  static thread_local int32_t chan[8][65536];

  int64_t written = 0;
  for (;;) {
    if (br.byte_pos() >= n) break;  // clean EOF
    int64_t frame_start = br.byte_pos();
    uint32_t sync;
    if (!br.read(14, &sync)) break;  // trailing garbage-free EOF
    if (sync != 0x3ffe) return -5;
    uint32_t resv, blocking;
    if (!br.read(1, &resv) || resv) return -5;
    if (!br.read(1, &blocking)) return -5;

    uint32_t bs_code, sr_code, ch_code, sz_code, resv2;
    if (!br.read(4, &bs_code) || !br.read(4, &sr_code) ||
        !br.read(4, &ch_code) || !br.read(3, &sz_code) ||
        !br.read(1, &resv2) || resv2)
      return -5;

    uint64_t coded_num;
    if (!read_coded_number(&br, &coded_num)) return -5;

    uint32_t blocksize;
    switch (bs_code) {
      case 0: return -5;
      case 1: blocksize = 192; break;
      case 6: { uint32_t b; if (!br.read(8, &b)) return -5; blocksize = b + 1; break; }
      case 7: { uint32_t b; if (!br.read(16, &b)) return -5; blocksize = b + 1; break; }
      default:
        blocksize = bs_code < 6 ? (576u << (bs_code - 2))
                                : (256u << (bs_code - 8));
    }

    // sample rate (only needed for CRC coverage / stream sanity)
    switch (sr_code) {
      case 12: { uint32_t b; if (!br.read(8, &b)) return -5; break; }
      case 13: case 14: { uint32_t b; if (!br.read(16, &b)) return -5; break; }
      case 15: return -5;
      default: break;
    }

    uint32_t bps = si.bps;
    switch (sz_code) {
      case 0: break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -5;
    }

    // CRC-8 covers the header bytes up to (not including) the crc byte
    int64_t hdr_end = br.byte_pos();
    uint32_t crc_read;
    if (!br.read(8, &crc_read)) return -5;
    if (crc8(data + frame_start, hdr_end - frame_start) != (uint8_t)crc_read)
      return -6;

    uint32_t nch;
    enum { INDEP, LEFT_SIDE, RIGHT_SIDE, MID_SIDE } mode = INDEP;
    if (ch_code < 8) {
      nch = ch_code + 1;
    } else if (ch_code == 8) { nch = 2; mode = LEFT_SIDE; }
    else if (ch_code == 9) { nch = 2; mode = RIGHT_SIDE; }
    else if (ch_code == 10) { nch = 2; mode = MID_SIDE; }
    else return -5;
    if (nch != si.channels) return -7;
    if (blocksize > 65535) return -5;

    for (uint32_t c = 0; c < nch; c++) {
      uint32_t sub_bps = bps;
      // side channel carries one extra bit
      if ((mode == LEFT_SIDE && c == 1) || (mode == RIGHT_SIDE && c == 0) ||
          (mode == MID_SIDE && c == 1))
        sub_bps += 1;
      if (!decode_subframe(&br, blocksize, sub_bps, chan[c])) return -8;
    }
    if (!br.align_byte()) return -5;
    int64_t frame_end = br.byte_pos();  // byte-aligned: end of subframe data
    uint32_t crc16_read;
    if (!br.read(16, &crc16_read)) return -5;
    // Frame CRC-16 covers everything from the first header byte through the
    // last (aligned) subframe byte; mismatch = corrupt frame body.
    if (crc16(data + frame_start, frame_end - frame_start) !=
        (uint16_t)crc16_read)
      return -6;

    // undo inter-channel decorrelation
    if (mode == LEFT_SIDE) {
      for (uint32_t i = 0; i < blocksize; i++)
        chan[1][i] = chan[0][i] - chan[1][i];
    } else if (mode == RIGHT_SIDE) {
      for (uint32_t i = 0; i < blocksize; i++)
        chan[0][i] = chan[1][i] + chan[0][i];
    } else if (mode == MID_SIDE) {
      for (uint32_t i = 0; i < blocksize; i++) {
        int32_t side = chan[1][i];
        int32_t mid = ((int64_t)chan[0][i] << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    if (written + blocksize > max_frames) return -9;
    for (uint32_t i = 0; i < blocksize; i++)
      for (uint32_t c = 0; c < nch; c++)
        out[(written + i) * nch + c] = chan[c][i];
    written += blocksize;
  }
  *frames_written = written;
  return 0;
}

}  // extern "C"
