// xspect2-tpu native host library
//
// Fast host-side paths for the framework (the reference keeps all heavy
// compute in native dependencies — COBS C++, rbloom Rust, Biopython C
// parsers; see SURVEY.md §2.3 — this library is their framework-native
// equivalent):
//
//   - streaming FASTA/FASTQ parsing into 2-bit-codeable uint8 arrays
//   - canonical k-mer extraction + the index hash (bit-identical to
//     xspect2_tpu/core/hashing.py)
//   - blocked bit-sliced index construction (multi-threaded scatter)
//   - reference CPU membership query (differential testing + baselines)
//
// Exposed as a plain C ABI for ctypes.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t INVALID = 255;

inline uint8_t code_of(char ch) {
    switch (ch) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return INVALID;
    }
}

// murmur3 fmix32 — must match core/hashing.py::_mix32
inline uint32_t mix32(uint32_t x) {
    x ^= x >> 16;
    x *= 0x85EBCA6Bu;
    x ^= x >> 13;
    x *= 0xC2B2AE35u;
    x ^= x >> 16;
    return x;
}

inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

struct KmerHash {
    uint32_t block;
    uint32_t base;
    uint32_t stride;
};

// must match core/hashing.py::kmer_hash_words / block_and_rows
inline KmerHash hash_kmer(uint32_t hi, uint32_t lo, uint32_t num_blocks) {
    uint32_t u = mix32(lo ^ 0x9E3779B1u);
    uint32_t v = mix32(hi ^ 0x85EBCA77u);
    uint32_t a = mix32(u ^ rotl32(v, 16) ^ 0xC2B2AE3Du);
    uint32_t b = mix32(v ^ rotl32(u, 13) ^ 0x27D4EB2Fu);
    uint32_t c = mix32((u + v) ^ 0x165667B1u) | 1u;
    return {a % num_blocks, b, c};
}

// Iterate canonical k-mers of a code sequence with a rolling 64-bit
// packing: F = forward 2k-bit big-endian pack, RC = reverse complement.
// canonical = min(F, RC); hi = canon >> 32, lo = low 32 bits — identical
// to core/dna.py::canonical_kmers' (hi, lo) split for k <= 32.
template <typename Fn>
inline void for_each_canonical_kmer(const uint8_t* codes, int64_t n, int k,
                                    int step, Fn&& fn) {
    if (n < k) return;
    const int shift_top = 2 * (k - 1);
    const uint64_t mask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    uint64_t F = 0, RC = 0;
    int valid_run = 0;
    for (int64_t i = 0; i < n; i++) {
        uint8_t c = codes[i];
        if (c > 3) {
            valid_run = 0;
            F = 0;
            RC = 0;
            continue;
        }
        F = ((F << 2) | c) & mask;
        RC = (RC >> 2) | (uint64_t(3 - c) << shift_top);
        valid_run++;
        int64_t pos = i - k + 1;  // window start
        if (valid_run >= k && pos % step == 0) {
            uint64_t canon = F < RC ? F : RC;
            fn(pos, uint32_t(canon >> 32), uint32_t(canon));
        }
    }
}

// ---- XXH3-64 for inputs up to 240 bytes -------------------------------
//
// The exact hash the reference's genus Bloom filter applies to canonical
// k-mer ASCII strings (reference:
// src/xspect/models/probabilistic_single_filter_model.py:88,157).
// Bit-identical to xspect2_tpu/core/xxh3.py and to the xxhash C library
// (pinned in tests/test_xxh3.py); k-mer strings are 21-31 bytes so the
// long-input (>240 B) algorithm is out of scope here.
namespace xxh3 {

constexpr uint64_t P64_1 = 0x9E3779B185EBCA87ULL;
constexpr uint64_t P64_2 = 0xC2B2AE3D27D4EB4FULL;
constexpr uint64_t P64_3 = 0x165667B19E3779F9ULL;
constexpr uint64_t MX1 = 0x165667919E3779F9ULL;   // XXH3 avalanche
constexpr uint64_t MX2 = 0x9FB21C651E98DF25ULL;   // rrmxmx

// XXH3_kSecret, the 192-byte default secret
constexpr char SECRET_HEX[] =
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e";

struct SecretBytes {
    uint8_t b[192];
    SecretBytes() {
        auto hex = [](char c) -> uint8_t {
            return c <= '9' ? c - '0' : c - 'a' + 10;
        };
        for (int i = 0; i < 192; i++)
            b[i] = hex(SECRET_HEX[2 * i]) * 16 + hex(SECRET_HEX[2 * i + 1]);
    }
};
const SecretBytes SEC;

inline uint64_t r64(const uint8_t* p) { uint64_t v; memcpy(&v, p, 8); return v; }
inline uint32_t r32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
inline uint64_t rotl(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

inline uint64_t avalanche_xxh64(uint64_t h) {
    h ^= h >> 33; h *= P64_2;
    h ^= h >> 29; h *= P64_3;
    return h ^ (h >> 32);
}

inline uint64_t avalanche(uint64_t h) {
    h ^= h >> 37; h *= MX1;
    return h ^ (h >> 32);
}

inline uint64_t rrmxmx(uint64_t h, uint64_t len) {
    h ^= rotl(h, 49) ^ rotl(h, 24);
    h *= MX2;
    h ^= (h >> 35) + len;
    h *= MX2;
    return h ^ (h >> 28);
}

inline uint64_t mul128_fold64(uint64_t a, uint64_t b) {
    __uint128_t p = (__uint128_t)a * b;
    return (uint64_t)p ^ (uint64_t)(p >> 64);
}

inline uint64_t mix16(const uint8_t* in, const uint8_t* sec, uint64_t seed) {
    return mul128_fold64(r64(in) ^ (r64(sec) + seed),
                         r64(in + 8) ^ (r64(sec + 8) - seed));
}

uint64_t hash(const uint8_t* d, int64_t n, uint64_t seed) {
    const uint8_t* sec = SEC.b;
    if (n == 0)
        return avalanche_xxh64(seed ^ r64(sec + 56) ^ r64(sec + 64));
    if (n <= 3) {
        uint32_t combined = ((uint32_t)d[0] << 16) | ((uint32_t)d[n >> 1] << 24) |
                            (uint32_t)d[n - 1] | ((uint32_t)n << 8);
        uint64_t bitflip = (uint64_t)(r32(sec) ^ r32(sec + 4)) + seed;
        return avalanche_xxh64(combined ^ bitflip);
    }
    if (n <= 8) {
        uint64_t seed2 = seed ^ ((uint64_t)__builtin_bswap32((uint32_t)seed) << 32);
        uint64_t input64 = (uint64_t)r32(d + n - 4) | ((uint64_t)r32(d) << 32);
        uint64_t bitflip = (r64(sec + 8) ^ r64(sec + 16)) - seed2;
        return rrmxmx(input64 ^ bitflip, (uint64_t)n);
    }
    if (n <= 16) {
        uint64_t lo = r64(d) ^ ((r64(sec + 24) ^ r64(sec + 32)) + seed);
        uint64_t hi = r64(d + n - 8) ^ ((r64(sec + 40) ^ r64(sec + 48)) - seed);
        uint64_t acc = (uint64_t)n + __builtin_bswap64(lo) + hi +
                       mul128_fold64(lo, hi);
        return avalanche(acc);
    }
    if (n <= 128) {
        uint64_t acc = (uint64_t)n * P64_1;
        if (n > 32) {
            if (n > 64) {
                if (n > 96) {
                    acc += mix16(d + 48, sec + 96, seed);
                    acc += mix16(d + n - 64, sec + 112, seed);
                }
                acc += mix16(d + 32, sec + 64, seed);
                acc += mix16(d + n - 48, sec + 80, seed);
            }
            acc += mix16(d + 16, sec + 32, seed);
            acc += mix16(d + n - 32, sec + 48, seed);
        }
        acc += mix16(d, sec, seed);
        acc += mix16(d + n - 16, sec + 16, seed);
        return avalanche(acc);
    }
    // 129..240
    uint64_t acc = (uint64_t)n * P64_1;
    for (int i = 0; i < 8; i++) acc += mix16(d + 16 * i, sec + 16 * i, seed);
    acc = avalanche(acc);
    for (int i = 8; i < n / 16; i++)
        acc += mix16(d + 16 * i, sec + 16 * (i - 8) + 3, seed);
    acc += mix16(d + n - 16, sec + 136 - 17, seed);
    return avalanche(acc);
}

}  // namespace xxh3

}  // namespace

extern "C" {

// ABI handshake for the ctypes loader: bump whenever an exported
// signature changes so a stale prebuilt .so is refused instead of
// being called with misaligned arguments (xspect2_tpu/native.py).
int32_t xs_abi_version(void) { return 3; }

// XXH3-64 of every row of an [n_rows, row_len] uint8 matrix (row_len
// 0..240); multi-threaded for large batches. Returns 0 on success.
int xs_xxh3_64(const uint8_t* data, int64_t n_rows, int64_t row_len,
               uint64_t seed, uint64_t* out) {
    if (row_len < 0 || row_len > 240) return -1;
    auto span = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++)
            out[i] = xxh3::hash(data + i * row_len, row_len, seed);
    };
    int64_t grain = 1 << 16;
    if (n_rows < 2 * grain) {
        span(0, n_rows);
        return 0;
    }
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = std::max(1u, std::min(hw, 8u));
    std::vector<std::thread> ts;
    int64_t per = (n_rows + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        int64_t lo = t * per, hi = std::min(n_rows, lo + per);
        if (lo >= hi) break;
        ts.emplace_back(span, lo, hi);
    }
    for (auto& th : ts) th.join();
    return 0;
}

// ---------------------------------------------------------------- parsing

// First pass: count bases and records. Returns 0 on success.
int xs_scan_file(const char* path, int is_fastq, int64_t* total_bases,
                 int64_t* num_records, int64_t* total_id_bytes) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    *total_bases = 0;
    *num_records = 0;
    *total_id_bytes = 0;

    std::string line;
    char buf[1 << 16];
    int fastq_line = 0;
    while (fgets(buf, sizeof buf, f)) {
        size_t len = strlen(buf);
        bool full_line = len > 0 && buf[len - 1] == '\n';
        while (len > 0 && (buf[len - 1] == '\n' || buf[len - 1] == '\r')) len--;
        if (is_fastq) {
            if (fastq_line == 0 && len > 0 && buf[0] == '@') {
                (*num_records)++;
                size_t id_len = 0;
                while (1 + id_len < len && buf[1 + id_len] != ' ' &&
                       buf[1 + id_len] != '\t')
                    id_len++;
                *total_id_bytes += id_len + 1;
            } else if (fastq_line == 1) {
                *total_bases += len;
            }
            if (full_line) fastq_line = (fastq_line + 1) % 4;
        } else {
            if (len > 0 && buf[0] == '>') {
                (*num_records)++;
                size_t id_len = 0;
                while (1 + id_len < len && buf[1 + id_len] != ' ' &&
                       buf[1 + id_len] != '\t')
                    id_len++;
                *total_id_bytes += id_len + 1;
            } else {
                *total_bases += len;
            }
            // continuation reads of overlong lines have buf[0] != '>' and
            // count as sequence, which is correct for FASTA
        }
    }
    fclose(f);
    return 0;
}

// Second pass: fill codes [total_bases], offsets [num_records+1] and a
// NUL-separated id blob. Returns number of records, or -1.
int64_t xs_parse_file(const char* path, int is_fastq, uint8_t* codes,
                      int64_t* offsets, char* ids) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;

    static uint8_t lut[256];
    static bool lut_init = false;
    if (!lut_init) {
        memset(lut, INVALID, sizeof lut);
        const char* bases = "ACGTacgt";
        const uint8_t vals[] = {0, 1, 2, 3, 0, 1, 2, 3};
        for (int i = 0; i < 8; i++) lut[(uint8_t)bases[i]] = vals[i];
        lut_init = true;
    }

    char buf[1 << 16];
    int64_t nrec = 0, nbase = 0, idpos = 0;
    int fastq_line = 0;
    bool in_header_continuation = false;
    while (fgets(buf, sizeof buf, f)) {
        size_t len = strlen(buf);
        bool full_line = len > 0 && buf[len - 1] == '\n';
        while (len > 0 && (buf[len - 1] == '\n' || buf[len - 1] == '\r')) len--;

        bool is_header = false;
        if (is_fastq) {
            is_header = (fastq_line == 0 && len > 0 && buf[0] == '@');
        } else {
            is_header = (!in_header_continuation && len > 0 && buf[0] == '>');
        }

        if (is_header) {
            offsets[nrec] = nbase;
            nrec++;
            size_t id_len = 0;
            while (1 + id_len < len && buf[1 + id_len] != ' ' &&
                   buf[1 + id_len] != '\t')
                id_len++;
            memcpy(ids + idpos, buf + 1, id_len);
            idpos += id_len;
            ids[idpos++] = '\0';
            in_header_continuation = !full_line;
        } else if (in_header_continuation) {
            in_header_continuation = !full_line;
        } else if (!is_fastq || fastq_line == 1) {
            for (size_t j = 0; j < len; j++) codes[nbase + j] = lut[(uint8_t)buf[j]];
            nbase += (int64_t)len;
        }
        if (is_fastq && full_line) fastq_line = (fastq_line + 1) % 4;
    }
    offsets[nrec] = nbase;
    fclose(f);
    return nrec;
}

// ---------------------------------------------------------------- index build

// Set the probe bits of all canonical k-mers of `codes` for one class.
// Multi-threaded over the sequence; bit sets use atomic fetch_or.
// With fields_per_word = P > 1 (field packing; core/blocked_index.py)
// probe j sits in word (b + j*c) & row_mask at field (g + j) & (P-1),
// g = (b >> 24) & (P-1) — must match core/hashing.py::block_words_fieldbase.
void xs_insert_kmers(uint32_t* table, int64_t num_blocks, int rows_per_block,
                     int class_words, int num_hashes, int fields_per_word,
                     int class_idx, const uint8_t* codes, int64_t n, int k,
                     int num_threads) {
    const uint32_t row_mask = uint32_t(rows_per_block - 1);
    const uint32_t field_mask = uint32_t(fields_per_word - 1);
    const int field_bits = 32 / fields_per_word;
    const int word_of_class = class_idx / 32;
    const uint32_t class_bit = 1u << (class_idx % 32);
    auto* atab = reinterpret_cast<std::atomic<uint32_t>*>(table);

    auto work = [&](int64_t lo_i, int64_t hi_i) {
        // thread owns window STARTS in [lo_i, hi_i); it must read up to
        // hi_i + k - 1 bases and skip starts outside its range
        int64_t begin = lo_i == 0 ? 0 : lo_i - (k - 1);
        int64_t end = hi_i + (k - 1) < n ? hi_i + (k - 1) : n;
        for_each_canonical_kmer(
            codes + begin, end - begin, k, 1,
            [&](int64_t pos, uint32_t hi, uint32_t lo) {
                int64_t gstart = begin + pos;
                if (gstart < lo_i || gstart >= hi_i) return;  // other thread's
                KmerHash h = hash_kmer(hi, lo, uint32_t(num_blocks));
                int64_t base = (int64_t(h.block) * rows_per_block);
                uint32_t r = h.base;
                uint32_t g = (h.base >> 24) & field_mask;
                for (int j = 0; j < num_hashes; j++) {
                    int64_t word =
                        (base + int64_t(r & row_mask)) * class_words + word_of_class;
                    uint32_t field = (g + uint32_t(j)) & field_mask;
                    uint32_t bit = class_bit << (field * field_bits);
                    atab[word].fetch_or(bit, std::memory_order_relaxed);
                    r += h.stride;
                }
            });
    };

    if (num_threads <= 1 || n < (int64_t)1 << 20) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t per = n / num_threads;
    for (int t = 0; t < num_threads; t++) {
        int64_t lo_i = t * per;
        int64_t hi_i = (t == num_threads - 1) ? n : (t + 1) * per;
        threads.emplace_back(work, lo_i, hi_i);
    }
    for (auto& th : threads) th.join();
}

// Reference CPU query: per-class hit counts of one sequence.
void xs_count_hits(const uint32_t* table, int64_t num_blocks, int rows_per_block,
                   int class_words, int num_hashes, int fields_per_word,
                   int num_classes, const uint8_t* codes, int64_t n, int k,
                   int step, int64_t* out_counts) {
    const uint32_t row_mask = uint32_t(rows_per_block - 1);
    const uint32_t field_mask = uint32_t(fields_per_word - 1);
    const int field_bits = 32 / fields_per_word;
    const uint32_t value_mask =
        field_bits == 32 ? 0xFFFFFFFFu : ((1u << field_bits) - 1u);
    memset(out_counts, 0, sizeof(int64_t) * num_classes);
    std::vector<uint32_t> anded(class_words);
    for_each_canonical_kmer(codes, n, k, step, [&](int64_t, uint32_t hi,
                                                   uint32_t lo) {
        KmerHash h = hash_kmer(hi, lo, uint32_t(num_blocks));
        int64_t base = int64_t(h.block) * rows_per_block;
        uint32_t r = h.base;
        uint32_t g = (h.base >> 24) & field_mask;
        for (int w = 0; w < class_words; w++) anded[w] = 0xFFFFFFFFu;
        for (int j = 0; j < num_hashes; j++) {
            const uint32_t* row =
                table + (base + int64_t(r & row_mask)) * class_words;
            if (fields_per_word == 1) {
                for (int w = 0; w < class_words; w++) anded[w] &= row[w];
            } else {
                uint32_t field = (g + uint32_t(j)) & field_mask;
                anded[0] &= (row[0] >> (field * field_bits)) & value_mask;
            }
            r += h.stride;
        }
        for (int c = 0; c < num_classes; c++) {
            if ((anded[c / 32] >> (c % 32)) & 1u) out_counts[c]++;
        }
    });
}

// ---------------------------------------------------------------- wire pack

// 2-bit-pack an [n, len] uint8 code matrix (row-major) into
// [n, ceil(len/4)] bytes, base i in bits 2*(i%4).  Invalid codes (>3)
// pack as 0 and set bad_flags[row] = 1 so the caller can ship a patch
// list alongside the packed payload (the host->device link is the
// system bottleneck; see ops/query.py).
void xs_pack_2bit(const uint8_t* codes, int64_t n, int64_t len, uint8_t* out,
                  uint8_t* bad_flags, int num_threads) {
    const int64_t l4 = (len + 3) / 4;
    auto work = [&](int64_t lo_r, int64_t hi_r) {
        for (int64_t r = lo_r; r < hi_r; r++) {
            const uint8_t* src = codes + r * len;
            uint8_t* dst = out + r * l4;
            uint8_t bad = 0;
            int64_t i = 0;
            for (int64_t b = 0; b < l4; b++) {
                uint8_t acc = 0;
                for (int s = 0; s < 8 && i < len; s += 2, i++) {
                    uint8_t c = src[i];
                    if (c > 3) {
                        bad = 1;
                        c = 0;
                    }
                    acc |= uint8_t(c << s);
                }
                dst[b] = acc;
            }
            bad_flags[r] = bad;
        }
    };
    if (num_threads <= 1 || n < 4096) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t per = (n + num_threads - 1) / num_threads;
    for (int t = 0; t < num_threads; t++) {
        int64_t lo_r = t * per;
        int64_t hi_r = std::min(n, lo_r + per);
        if (lo_r >= hi_r) break;
        threads.emplace_back(work, lo_r, hi_r);
    }
    for (auto& th : threads) th.join();
}

// Packed canonical k-mers of a sequence (for tests / tooling):
// writes hi, lo, valid arrays of length n-k+1 stepped; returns count.
int64_t xs_canonical_kmers(const uint8_t* codes, int64_t n, int k, int step,
                           uint32_t* hi_out, uint32_t* lo_out,
                           uint8_t* valid_out) {
    if (n < k) return 0;
    int64_t n_windows = (n - k) / step + 1;
    memset(valid_out, 0, n_windows);
    for_each_canonical_kmer(codes, n, k, step,
                            [&](int64_t pos, uint32_t hi, uint32_t lo) {
                                int64_t w = pos / step;
                                hi_out[w] = hi;
                                lo_out[w] = lo;
                                valid_out[w] = 1;
                            });
    return n_windows;
}

}  // extern "C"
