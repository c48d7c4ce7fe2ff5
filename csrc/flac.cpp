// Native FLAC decoder (read path of the data loader).
//
// Role in the stack: the reference ingests FLAC via soundfile/libsndfile
// (reference speech_to_text_dataset.py:115; LibriSpeech ships FLAC).  Neither
// library exists in this image, so this is an original implementation of the
// FLAC decode spec (https://xiph.org/flac/format.html) covering everything
// real encoders emit: CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes,
// RICE and RICE2 residual partitions with escape codes, wasted bits, and
// left-side / right-side / mid-side stereo decorrelation.
//
// Correctness oracle: STREAMINFO carries the MD5 of the raw samples; the
// test decodes real FLAC files and verifies the digest (python hashlib side).
//
// C ABI consumed via ctypes (speecht5_tpu/data/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte = 0;
    int bit = 0;  // bits consumed in current byte (0..7)

    bool ok() const { return byte < size; }

    uint32_t read_bit() {
        uint32_t b = (data[byte] >> (7 - bit)) & 1;
        if (++bit == 8) { bit = 0; byte++; }
        return b;
    }

    uint64_t read_bits(int n) {  // n <= 57
        uint64_t v = 0;
        while (n > 0 && byte < size) {
            int avail = 8 - bit;
            int take = n < avail ? n : avail;
            uint32_t cur = data[byte];
            uint32_t chunk = (cur >> (avail - take)) & ((1u << take) - 1);
            v = (v << take) | chunk;
            bit += take;
            if (bit == 8) { bit = 0; byte++; }
            n -= take;
        }
        return v;
    }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n > 0 && (v >> (n - 1)) & 1) {
            return (int64_t)(v | (~0ull << n));
        }
        return (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t q = 0;
        while (byte < size && read_bit() == 0) q++;
        return q;
    }

    void align() {
        if (bit) { bit = 0; byte++; }
    }
};

struct StreamInfo {
    uint32_t sample_rate = 0;
    uint32_t channels = 0;
    uint32_t bps = 0;
    uint64_t total_samples = 0;
    uint8_t md5[16] = {0};
};

// UTF-8-style coded number in frame headers (up to 56 bits)
uint64_t read_utf8(BitReader& br) {
    uint64_t b0 = br.read_bits(8);
    if (!(b0 & 0x80)) return b0;
    int n = 0;
    for (uint64_t m = 0x40; b0 & m; m >>= 1) n++;
    uint64_t v = b0 & ((1ull << (6 - n)) - 1);
    for (int i = 0; i < n; i++) v = (v << 6) | (br.read_bits(8) & 0x3F);
    return v;
}

const int64_t kError = -1;

bool decode_residual(BitReader& br, int order, uint32_t block_size,
                     std::vector<int64_t>& out) {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int pbits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 15 : 31;
    uint32_t part_order = (uint32_t)br.read_bits(4);
    uint32_t parts = 1u << part_order;
    if (block_size % parts) return false;
    uint32_t part_len = block_size >> part_order;
    if (part_len < (uint32_t)order) return false;  // malformed: underflow
    for (uint32_t p = 0; p < parts; p++) {
        uint32_t n = part_len - (p == 0 ? order : 0);
        uint32_t param = (uint32_t)br.read_bits(pbits);
        if (param == escape) {
            uint32_t raw = (uint32_t)br.read_bits(5);
            for (uint32_t i = 0; i < n; i++)
                out.push_back(raw ? br.read_signed(raw) : 0);
        } else {
            for (uint32_t i = 0; i < n; i++) {
                uint64_t q = br.read_unary();
                uint64_t r = param ? br.read_bits(param) : 0;
                uint64_t u = (q << param) | r;
                out.push_back((int64_t)(u >> 1) ^ -(int64_t)(u & 1));
            }
        }
        if (!br.ok()) return false;
    }
    return true;
}

bool decode_subframe(BitReader& br, uint32_t block_size, int bps,
                     std::vector<int64_t>& s) {
    if (br.read_bits(1) != 0) return false;  // reserved
    uint32_t type = (uint32_t)br.read_bits(6);
    int wasted = 0;
    if (br.read_bits(1)) wasted = 1 + (int)br.read_unary();
    bps -= wasted;

    s.clear();
    s.reserve(block_size);
    if (type == 0) {                       // CONSTANT
        int64_t v = br.read_signed(bps);
        s.assign(block_size, v);
    } else if (type == 1) {                // VERBATIM
        for (uint32_t i = 0; i < block_size; i++)
            s.push_back(br.read_signed(bps));
    } else if (type >= 8 && type <= 12) {  // FIXED
        int order = type - 8;
        for (int i = 0; i < order; i++) s.push_back(br.read_signed(bps));
        std::vector<int64_t> res;
        if (!decode_residual(br, order, block_size, res)) return false;
        size_t r = 0;
        for (uint32_t i = order; i < block_size; i++, r++) {
            int64_t p = 0;
            switch (order) {
                case 0: p = 0; break;
                case 1: p = s[i - 1]; break;
                case 2: p = 2 * s[i - 1] - s[i - 2]; break;
                case 3: p = 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3]; break;
                case 4: p = 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3]
                            - s[i - 4]; break;
            }
            s.push_back(p + res[r]);
        }
    } else if (type >= 32) {               // LPC, order = type - 31
        int order = (int)type - 31;
        for (int i = 0; i < order; i++) s.push_back(br.read_signed(bps));
        int precision = (int)br.read_bits(4) + 1;
        if (precision == 16) return false;  // 1111 invalid
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        std::vector<int64_t> coef(order);
        for (int i = 0; i < order; i++) coef[i] = br.read_signed(precision);
        std::vector<int64_t> res;
        if (!decode_residual(br, order, block_size, res)) return false;
        size_t r = 0;
        for (uint32_t i = order; i < block_size; i++, r++) {
            int64_t acc = 0;
            for (int j = 0; j < order; j++) acc += coef[j] * s[i - 1 - j];
            s.push_back((acc >> shift) + res[r]);
        }
    } else {
        return false;
    }
    if (wasted) {
        for (auto& v : s) v <<= wasted;
    }
    return br.ok();
}

bool parse_streaminfo(const uint8_t* d, size_t size, StreamInfo* si,
                      size_t* frames_at) {
    if (size < 42 || memcmp(d, "fLaC", 4)) return false;
    size_t pos = 4;
    bool have_si = false;
    while (pos + 4 <= size) {
        uint8_t hdr = d[pos];
        uint32_t len = (d[pos + 1] << 16) | (d[pos + 2] << 8) | d[pos + 3];
        pos += 4;
        if (pos + len > size) return false;  // truncated metadata block
        if ((hdr & 0x7F) == 0 && len >= 34) {  // STREAMINFO
            const uint8_t* p = d + pos;
            si->sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
            si->channels = ((p[12] >> 1) & 0x7) + 1;
            si->bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
            si->total_samples = ((uint64_t)(p[13] & 0xF) << 32)
                | ((uint64_t)p[14] << 24) | (p[15] << 16) | (p[16] << 8)
                | p[17];
            memcpy(si->md5, p + 18, 16);
            have_si = true;
        }
        pos += len;
        if (hdr & 0x80) break;  // last metadata block
    }
    *frames_at = pos;
    return have_si && pos < size;
}

int64_t decode_file(const char* path, int32_t* out, int64_t cap,
                    StreamInfo* si_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return kError;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(fsize);
    if (fread(buf.data(), 1, fsize, f) != (size_t)fsize) {
        fclose(f);
        return kError;
    }
    fclose(f);

    StreamInfo si;
    size_t frames_at = 0;
    if (!parse_streaminfo(buf.data(), buf.size(), &si, &frames_at))
        return kError;
    if (si_out) *si_out = si;
    if (!out) return (int64_t)si.total_samples;  // info-only call

    BitReader br{buf.data(), buf.size(), frames_at, 0};
    int64_t written = 0;  // per-channel samples written
    std::vector<std::vector<int64_t>> ch(si.channels);

    while (br.byte + 2 < br.size) {
        // frame header
        uint32_t sync = (uint32_t)br.read_bits(14);
        if (sync != 0x3FFE) break;
        br.read_bits(1);                       // reserved
        br.read_bits(1);                       // blocking strategy
        uint32_t bs_code = (uint32_t)br.read_bits(4);
        uint32_t sr_code = (uint32_t)br.read_bits(4);
        uint32_t ch_asgn = (uint32_t)br.read_bits(4);
        uint32_t ss_code = (uint32_t)br.read_bits(3);
        br.read_bits(1);                       // reserved
        read_utf8(br);                         // frame/sample number
        uint32_t block_size;
        if (bs_code == 1) block_size = 192;
        else if (bs_code >= 2 && bs_code <= 5) block_size = 576u << (bs_code - 2);
        else if (bs_code == 6) block_size = (uint32_t)br.read_bits(8) + 1;
        else if (bs_code == 7) block_size = (uint32_t)br.read_bits(16) + 1;
        else if (bs_code >= 8) block_size = 256u << (bs_code - 8);
        else return kError;
        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
        int bps;
        switch (ss_code) {
            case 0: bps = si.bps; break;
            case 1: bps = 8; break;
            case 2: bps = 12; break;
            case 4: bps = 16; break;
            case 5: bps = 20; break;
            case 6: bps = 24; break;
            case 7: bps = 32; break;
            default: return kError;
        }
        br.read_bits(8);                       // CRC-8 (not verified)

        uint32_t n_ch = ch_asgn < 8 ? ch_asgn + 1 : 2;
        if (n_ch != si.channels) return kError;
        for (uint32_t c = 0; c < n_ch; c++) {
            int sub_bps = bps;
            if ((ch_asgn == 8 && c == 1) || (ch_asgn == 9 && c == 0) ||
                (ch_asgn == 10 && c == 1))
                sub_bps += 1;                  // side channel
            if (!decode_subframe(br, block_size, sub_bps, ch[c]))
                return kError;
        }
        br.align();
        br.read_bits(16);                      // CRC-16 (not verified)

        // stereo decorrelation
        if (ch_asgn == 8) {                    // left/side: R = L - side
            for (uint32_t i = 0; i < block_size; i++)
                ch[1][i] = ch[0][i] - ch[1][i];
        } else if (ch_asgn == 9) {             // right/side: L = R + side
            for (uint32_t i = 0; i < block_size; i++)
                ch[0][i] = ch[1][i] + ch[0][i];
        } else if (ch_asgn == 10) {            // mid/side
            for (uint32_t i = 0; i < block_size; i++) {
                int64_t mid = ch[0][i], side = ch[1][i];
                mid = (mid << 1) | (side & 1);
                ch[0][i] = (mid + side) >> 1;
                ch[1][i] = (mid - side) >> 1;
            }
        }

        for (uint32_t i = 0; i < block_size; i++) {
            if (written + (int64_t)i >= cap) return cap;  // truncate at cap
            for (uint32_t c = 0; c < n_ch; c++)
                out[(written + i) * n_ch + c] = (int32_t)ch[c][i];
        }
        written += block_size;
        if (si.total_samples && written >= (int64_t)si.total_samples) break;
    }
    return written;
}

}  // namespace

extern "C" {

// STREAMINFO probe: fills sr/channels/bps/md5, returns total samples or -1.
int64_t flac_info(const char* path, int32_t* sr, int32_t* channels,
                  int32_t* bps, uint8_t* md5_out) {
    StreamInfo si;
    int64_t n = decode_file(path, nullptr, 0, &si);
    if (n < 0) return kError;
    *sr = (int32_t)si.sample_rate;
    *channels = (int32_t)si.channels;
    *bps = (int32_t)si.bps;
    if (md5_out) memcpy(md5_out, si.md5, 16);
    return n;
}

// Full decode into caller buffer [cap] of interleaved int32 (raw, NOT
// normalized).  Returns per-channel sample count or -1.
int64_t flac_read_i32(const char* path, int32_t* out, int64_t cap) {
    StreamInfo si;
    return decode_file(path, out, cap, &si);
}

}  // extern "C"
