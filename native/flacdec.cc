// Native FLAC decoder for the data-loading runtime.
//
// The reference leans on torchaudio's native C++ I/O for LibriSpeech FLAC decode
// (train_librispeech.py:102 via torchaudio.load); this image has no torchaudio /
// libsndfile / ffmpeg, so the framework ships its own: a compact, dependency-free
// decoder for the FLAC subset in the wild (CONSTANT / VERBATIM / FIXED / LPC subframes,
// rice + rice2 residuals, all stereo decorrelation modes, 8/16/24-bit). Exposed through
// a C ABI consumed by ctypes (llama_x_tpu/data/flac.py). CRCs are not verified (decode
// throughput over integrity checking, same stance as soundfile's default path).
//
// Build: g++ -O3 -shared -fPIC flacdec.cc -o libflacdec.so   (driven by flac.py)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t len;
  size_t byte = 0;
  int bit = 0;  // bits consumed of current byte (0..7)
  bool fail = false;

  BitReader(const uint8_t* d, size_t n) : data(d), len(n) {}

  inline uint32_t read_bit() {
    if (byte >= len) { fail = true; return 0; }
    uint32_t b = (data[byte] >> (7 - bit)) & 1u;
    if (++bit == 8) { bit = 0; ++byte; }
    return b;
  }

  inline uint64_t read_bits(int n) {  // n <= 57
    uint64_t v = 0;
    while (n > 0) {
      if (byte >= len) { fail = true; return 0; }
      int avail = 8 - bit;
      int take = n < avail ? n : avail;
      uint32_t chunk = (data[byte] >> (avail - take)) & ((1u << take) - 1u);
      v = (v << take) | chunk;
      bit += take;
      if (bit == 8) { bit = 0; ++byte; }
      n -= take;
    }
    return v;
  }

  inline int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? (int64_t)(v | ~((sign << 1) - 1)) : (int64_t)v;
  }

  inline uint32_t read_unary() {
    uint32_t q = 0;
    while (!fail && read_bit() == 0) ++q;
    return q;
  }

  inline void align() { if (bit) { bit = 0; ++byte; } }
};

// UTF-8-style coded number used for frame/sample index (up to 36 bits, 7 bytes)
uint64_t read_utf8(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) { return b0; }
  else if ((b0 & 0xE0) == 0xC0) { extra = 1; v = b0 & 0x1F; }
  else if ((b0 & 0xF0) == 0xE0) { extra = 2; v = b0 & 0x0F; }
  else if ((b0 & 0xF8) == 0xF0) { extra = 3; v = b0 & 0x07; }
  else if ((b0 & 0xFC) == 0xF8) { extra = 4; v = b0 & 0x03; }
  else if ((b0 & 0xFE) == 0xFC) { extra = 5; v = b0 & 0x01; }
  else if (b0 == 0xFE) { extra = 6; v = 0; }
  else { br.fail = true; return 0; }
  for (int i = 0; i < extra; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
  return v;
}

bool read_residual(BitReader& br, int blocksize, int predictor_order, int64_t* res) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = (uint32_t)br.read_bits(4);
  uint32_t nparts = 1u << porder;
  int idx = 0;
  for (uint32_t p = 0; p < nparts; ++p) {
    int count = (int)(blocksize >> porder);
    if (p == 0) count -= predictor_order;
    if (count < 0) return false;
    uint32_t rice = (uint32_t)br.read_bits(plen);
    if (rice == escape) {
      uint32_t rawbits = (uint32_t)br.read_bits(5);
      for (int i = 0; i < count; ++i) res[idx++] = rawbits ? br.read_signed(rawbits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t r = rice ? br.read_bits(rice) : 0;
        uint64_t u = ((uint64_t)q << rice) | r;
        res[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);  // zigzag
      }
    }
    if (br.fail) return false;
  }
  return true;
}

const int kFixedOrders[5][4] = {
    {},               // order 0: residual only
    {1},              // s[i] = s[i-1] + r
    {2, -1},          // s[i] = 2 s[i-1] - s[i-2] + r
    {3, -3, 1},       // ...
    {4, -6, 4, -1},
};

bool decode_subframe(BitReader& br, int blocksize, int bps, int64_t* out) {
  if (br.read_bit() != 0) return false;  // padding bit must be 0
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = 1 + (int)br.read_unary();
  bps -= wasted;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    int order = (int)type - 8;
    std::vector<int64_t> res(blocksize);
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!read_residual(br, blocksize, order, res.data() + order)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += (int64_t)kFixedOrders[order][j] * out[i - 1 - j];
      out[i] = pred + res[i];
    }
  } else if (type >= 32) {  // LPC, order = type - 31
    int order = (int)type - 31;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) return false;  // 0b1111 is invalid
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    std::vector<int64_t> res(blocksize);
    if (!read_residual(br, blocksize, order, res.data() + order)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] = (pred >> shift) + res[i];
    }
  } else {
    return false;  // reserved type
  }
  if (wasted) for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return !br.fail;
}

}  // namespace

extern "C" {

// Decode a whole FLAC stream held in memory.
//   data/len        : the .flac file bytes
//   out             : caller buffer for interleaved int32 samples (or null to query)
//   out_capacity    : number of int32 slots in out
//   sample_rate/channels/bits_per_sample : outputs
// Returns total samples-per-channel decoded, -1 on malformed input, -2 if out_capacity
// is too small (caller should retry with a larger buffer), or the STREAMINFO total
// (per-channel) count if out == null (0 when the stream does not declare it).
long long flac_decode(const uint8_t* data, size_t len, int32_t* out, size_t out_capacity,
                      int* sample_rate, int* channels, int* bits_per_sample) {
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  int sr = 0, nch = 0, bps = 0;
  long long total_samples = 0;
  bool last = false;
  while (!last) {
    if (pos + 4 > len) return -1;
    last = data[pos] & 0x80;
    int type = data[pos] & 0x7F;
    size_t blen = ((size_t)data[pos + 1] << 16) | ((size_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (pos + blen > len) return -1;
    if (type == 0 && blen >= 34) {  // STREAMINFO
      const uint8_t* s = data + pos;
      sr = ((int)s[10] << 12) | ((int)s[11] << 4) | (s[12] >> 4);
      nch = ((s[12] >> 1) & 0x7) + 1;
      bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      total_samples = ((long long)(s[13] & 0x0F) << 32) | ((long long)s[14] << 24) |
                      ((long long)s[15] << 16) | ((long long)s[16] << 8) | s[17];
    }
    pos += blen;
  }
  if (sr == 0 || nch == 0) return -1;
  if (sample_rate) *sample_rate = sr;
  if (channels) *channels = nch;
  if (bits_per_sample) *bits_per_sample = bps;
  if (!out) return total_samples;

  BitReader br(data, len);
  br.byte = pos;
  long long written = 0;  // samples per channel
  std::vector<std::vector<int64_t>> ch(nch);

  while (br.byte < br.len) {
    // frame sync 11111111 111110xx
    if (br.byte + 2 > br.len) break;
    if (data[br.byte] != 0xFF || (data[br.byte + 1] & 0xFC) != 0xF8) return -1;
    br.bit = 0;
    br.read_bits(14);               // sync
    br.read_bit();                  // reserved
    br.read_bit();                  // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_assign = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit();                  // reserved
    read_utf8(br);                  // frame/sample number

    int blocksize;
    switch (bs_code) {
      case 0: return -1;
      case 1: blocksize = 192; break;
      case 6: blocksize = (int)br.read_bits(8) + 1; break;
      case 7: blocksize = (int)br.read_bits(16) + 1; break;
      default:
        if (bs_code <= 5) blocksize = 576 << (bs_code - 2);
        else blocksize = 256 << (bs_code - 8);
    }
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    int fbps = bps;
    switch (ss_code) {
      case 0: break;
      case 1: fbps = 8; break;
      case 2: fbps = 12; break;
      case 4: fbps = 16; break;
      case 5: fbps = 20; break;
      case 6: fbps = 24; break;
      case 7: fbps = 32; break;
      default: return -1;
    }
    br.read_bits(8);  // frame header CRC-8 (unchecked)
    if (br.fail) return -1;

    int frame_ch = (ch_assign <= 7) ? (int)ch_assign + 1 : 2;
    if (frame_ch != nch) return -1;
    for (int c = 0; c < nch; ++c) {
      if ((int)ch[c].size() < blocksize) ch[c].resize(blocksize);
      int sub_bps = fbps;
      if ((ch_assign == 8 && c == 1) || (ch_assign == 9 && c == 0) || (ch_assign == 10 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, ch[c].data())) return -1;
    }
    br.align();
    br.read_bits(16);  // frame CRC-16 (unchecked)
    if (br.fail) return -1;

    // undo stereo decorrelation
    if (ch_assign == 8) {        // left/side: right = left - side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_assign == 9) { // right/side: left = right + side
      for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[1][i] + ch[0][i];
    } else if (ch_assign == 10) {// mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    if ((size_t)((written + blocksize) * nch) > out_capacity) return -2;  // caller: grow buffer
    for (int i = 0; i < blocksize; ++i)
      for (int c = 0; c < nch; ++c) out[(written + i) * nch + c] = (int32_t)ch[c][i];
    written += blocksize;
    if (total_samples > 0 && written >= total_samples) break;
  }
  return written;
}

}  // extern "C"
