// Lexicon-constrained CTC beam decoder with word n-gram LM fusion.
//
// Role in the stack: the reference's SpeechLM inference decodes CTC emissions
// with flashlight's C++ LexiconDecoder + KenLM (reference
// SpeechLM/speechlm/infer.py:29-33,121, config/decode/infer_kenlm.yaml).
// Neither library exists in this image, so this is an original implementation
// of the same contract: beam search over CTC posteriors where
//   - hypotheses are constrained to spellings in a lexicon trie,
//   - a backoff word n-gram LM (standard ARPA file) scores each completed
//     word, weighted by lm_weight, plus a flat word_score bonus,
//   - hypotheses are merged by (trie node, LM state, last emitted token).
//
// C ABI consumed via ctypes (speecht5_tpu/decode/lexicon.py), which also
// carries a numpy reference implementation used for parity tests.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <fstream>
#include <map>
#include <thread>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double NEG_INF = -1e30;

inline double log_add(double a, double b) {
    if (a <= NEG_INF) return b;
    if (b <= NEG_INF) return a;
    double m = std::max(a, b);
    return m + std::log1p(std::exp(std::min(a, b) - m));
}

// ------------------------------------------------- KenLM probing binary
// Read/write support for KenLM's compiled binary format (version 5,
// PROBING model): the artifact the reference decode recipes consume
// directly (reference SpeechLM/README.md:105-121 ships 4-gram.bin;
// speechlm/infer.py:29-33 hands it to flashlight's KenLM wrapper).
//
// Layout implemented from the published KenLM sources (lm/binary_format.cc,
// lm/vocab.cc, lm/search_hashed.hh, util/probing_hash_table.hh,
// util/murmur_hash.cc):
//   Sanity(88)  magic[56] | 0.0f 1.0f -0.5f | u32 1, u32 MAX | pad | u64 1
//   FixedWidthParameters(20)  u8 order | f32 probing_multiplier |
//       u32 model_type (0=PROBING) | u8 has_vocabulary | u32 search_version
//   u64 counts[order], zero-padded to 8
//   ProbingVocabulary  header(8: u32 bound, u8 saw_unk) +
//       hash table {u64 MurmurHash64A(word) -> u32 id} (16-byte entries)
//   HashedSearch  unigram ProbBackoff[bound] (id-indexed, no hashing);
//       per middle order a probing table {u64 chained-id hash -> f32 prob,
//       f32 backoff}; longest order {u64 -> f32 prob}
//   trailing null-terminated vocab strings in id order (id 0 = <unk>)
// N-gram keys chain as node = u64(w1); node = CombineWordHash(node, w_i).
// Values stay log10 in the file (KenLM convention) and convert to natural
// log on load.  Files written here round-trip through this reader and give
// score parity with the ARPA path (tests/test_lexicon_decode.py); the
// layout constants above are the contract for kenlm-built artifacts.

inline uint64_t murmur64a(const void* key, size_t len, uint64_t seed) {
    const uint64_t m = 0xc6a4a7935bd1e995ULL;
    const int r = 47;
    uint64_t h = seed ^ (len * m);
    const unsigned char* data = static_cast<const unsigned char*>(key);
    size_t n8 = len / 8;
    for (size_t i = 0; i < n8; i++) {
        uint64_t k;
        std::memcpy(&k, data + i * 8, 8);
        k *= m; k ^= k >> r; k *= m;
        h ^= k; h *= m;
    }
    const unsigned char* tail = data + n8 * 8;
    switch (len & 7) {
        case 7: h ^= uint64_t(tail[6]) << 48; [[fallthrough]];
        case 6: h ^= uint64_t(tail[5]) << 40; [[fallthrough]];
        case 5: h ^= uint64_t(tail[4]) << 32; [[fallthrough]];
        case 4: h ^= uint64_t(tail[3]) << 24; [[fallthrough]];
        case 3: h ^= uint64_t(tail[2]) << 16; [[fallthrough]];
        case 2: h ^= uint64_t(tail[1]) << 8;  [[fallthrough]];
        case 1: h ^= uint64_t(tail[0]); h *= m;
    }
    h ^= h >> r; h *= m; h ^= h >> r;
    return h;
}

inline uint64_t kenlm_combine(uint64_t current, uint32_t next) {
    return (current * 8978948897894561157ULL) ^
           (uint64_t(1 + next) * 17894857484156487943ULL);
}

inline uint64_t kenlm_chain(const int32_t* ids, size_t n) {
    uint64_t h = uint64_t(uint32_t(ids[0]));
    for (size_t i = 1; i < n; i++) h = kenlm_combine(h, uint32_t(ids[i]));
    return h;
}

constexpr char KENLM_MAGIC[] =
    "mmap lm http://kheafield.com/code format version 5\n";
constexpr size_t KENLM_MAGIC_FIELD = 56;   // zero-padded magic field
constexpr size_t KENLM_SANITY = 88;
constexpr double KENLM_DEFAULT_MULT = 1.5;

inline uint64_t kenlm_buckets(uint64_t entries, double mult) {
    uint64_t b = uint64_t(entries * mult);
    return std::max<uint64_t>(b, entries + 1);
}

// 16-byte probing entries: {u64 key, payload}.  key 0 = empty slot.
struct KVocabEntry { uint64_t key; uint32_t id; uint32_t pad; };
struct KProbEntry  { uint64_t key; float prob; float backoff; };

template <class E>
bool probe_find(const std::vector<E>& table, uint64_t key, E& out) {
    if (table.empty() || key == 0) return false;
    size_t b = table.size();
    for (size_t i = key % b, n = 0; n < b; i = (i + 1) % b, n++) {
        if (table[i].key == key) { out = table[i]; return true; }
        if (table[i].key == 0) return false;
    }
    return false;
}

template <class E>
void probe_insert(std::vector<E>& table, const E& e) {
    size_t b = table.size();
    for (size_t i = e.key % b;; i = (i + 1) % b) {
        if (table[i].key == 0) { table[i] = e; return; }
    }
}

// ---------------------------------------------------------------- ARPA LM
// Backoff n-gram LM over word ids.  Probabilities and backoffs are log10 in
// the file; stored as natural log here (KenLM reports log10 — callers of this
// library get natural-log scores, matching the rest of the stack).
struct NGramLM {
    // key: word-id sequence packed into a string of int32
    std::unordered_map<std::string, std::pair<float, float>> grams;  // (logp, backoff)
    std::unordered_map<std::string, int32_t> vocab;
    int order = 0;

    // KenLM probing representation (hash tables over kenlm word ids),
    // populated by load_kenlm instead of `grams`.  Queries dispatch through
    // lookup() so score() is representation-agnostic.
    bool kenlm_mode = false;
    std::vector<std::pair<float, float>> k_unigram;   // natural log, by id
    std::vector<std::vector<KProbEntry>> k_middle;    // orders 2..order-1
    std::vector<KProbEntry> k_longest;                // order N

    // (prob, backoff) of an exact n-gram, natural log; false when absent
    bool lookup(const int32_t* ids, size_t n, double* p, double* b) const {
        if (!kenlm_mode) {
            auto it = grams.find(std::string(
                reinterpret_cast<const char*>(ids), n * sizeof(int32_t)));
            if (it == grams.end()) return false;
            *p = it->second.first;
            *b = it->second.second;
            return true;
        }
        if (n == 1) {
            if (ids[0] < 0 || size_t(ids[0]) >= k_unigram.size())
                return false;
            *p = k_unigram[ids[0]].first;
            *b = k_unigram[ids[0]].second;
            return true;
        }
        uint64_t h = kenlm_chain(ids, n);
        KProbEntry e;
        if (int(n) == order) {
            if (!probe_find(k_longest, h, e)) return false;
            *p = e.prob;
            *b = 0.0;
            return true;
        }
        if (n < 2 || n - 2 >= k_middle.size()) return false;
        if (!probe_find(k_middle[n - 2], h, e)) return false;
        *p = e.prob;
        *b = e.backoff;
        return true;
    }

    static std::string key(const std::vector<int32_t>& ids) {
        return std::string(reinterpret_cast<const char*>(ids.data()),
                           ids.size() * sizeof(int32_t));
    }

    int32_t word_id(const std::string& w) const {
        auto it = vocab.find(w);
        if (it != vocab.end()) return it->second;
        auto u = vocab.find("<unk>");
        return u != vocab.end() ? u->second : -1;
    }

    // Compiled-LM binary format (the role of KenLM's build_binary output,
    // reference SpeechLM/speechlm/infer.py:29-33 loads compiled .bin LMs):
    // magic, order, vocab table, flat gram records.  Natural-log values are
    // stored directly, so load is a single parse-free sweep.
    static constexpr char BIN_MAGIC[8] = {'S','5','N','G','L','M','\x01','\n'};

    bool load_binary(std::ifstream& f) {
        int32_t ord = 0;
        int64_t vsize = 0, ngrams = 0;
        f.read(reinterpret_cast<char*>(&ord), 4);
        f.read(reinterpret_cast<char*>(&vsize), 8);
        f.read(reinterpret_cast<char*>(&ngrams), 8);
        if (!f || ord <= 0 || vsize < 0 || ngrams < 0) return false;
        order = ord;
        vocab.reserve(vsize);
        std::string w;
        for (int64_t i = 0; i < vsize; i++) {
            uint16_t len = 0;
            f.read(reinterpret_cast<char*>(&len), 2);
            w.resize(len);
            f.read(&w[0], len);
            if (!f) return false;
            vocab.emplace(w, (int32_t)i);
        }
        grams.reserve(ngrams);
        std::vector<int32_t> ids;
        for (int64_t g = 0; g < ngrams; g++) {
            uint8_t n = 0;
            f.read(reinterpret_cast<char*>(&n), 1);
            ids.resize(n);
            f.read(reinterpret_cast<char*>(ids.data()), 4 * n);
            float logp = 0, backoff = 0;
            f.read(reinterpret_cast<char*>(&logp), 4);
            f.read(reinterpret_cast<char*>(&backoff), 4);
            if (!f) return false;
            grams[key(ids)] = {logp, backoff};
        }
        return order > 0;
    }

    bool save_binary(const char* path) const {
        std::ofstream f(path, std::ios::binary);
        if (!f) return false;
        f.write(BIN_MAGIC, 8);
        int32_t ord = order;
        int64_t vsize = (int64_t)vocab.size();
        int64_t ngrams = (int64_t)grams.size();
        f.write(reinterpret_cast<const char*>(&ord), 4);
        f.write(reinterpret_cast<const char*>(&vsize), 8);
        f.write(reinterpret_cast<const char*>(&ngrams), 8);
        // vocab by id order
        std::vector<const std::string*> words(vocab.size());
        for (auto& kv : vocab) words[kv.second] = &kv.first;
        for (auto* w : words) {
            uint16_t len = (uint16_t)std::min<size_t>(w->size(), 65535);
            f.write(reinterpret_cast<const char*>(&len), 2);
            f.write(w->data(), len);
        }
        for (auto& kv : grams) {
            uint8_t n = (uint8_t)(kv.first.size() / sizeof(int32_t));
            f.write(reinterpret_cast<const char*>(&n), 1);
            f.write(kv.first.data(), 4 * n);
            f.write(reinterpret_cast<const char*>(&kv.second.first), 4);
            f.write(reinterpret_cast<const char*>(&kv.second.second), 4);
        }
        return (bool)f;
    }

    // ---- KenLM probing binary (layout documented above murmur64a)
    bool load_kenlm(std::ifstream& f) {
        const double ln10 = std::log(10.0);
        char sanity[KENLM_SANITY];
        f.seekg(0);
        f.read(sanity, KENLM_SANITY);
        if (!f) return false;
        float ref_f[3];
        std::memcpy(ref_f, sanity + KENLM_MAGIC_FIELD, 12);
        if (ref_f[0] != 0.0f || ref_f[1] != 1.0f || ref_f[2] != -0.5f)
            return false;   // endianness / float-layout mismatch
        uint8_t ord8;
        float mult;
        uint32_t model_type;
        uint8_t has_vocab;
        char fwp[20];
        f.read(fwp, 20);
        if (!f) return false;
        std::memcpy(&ord8, fwp + 0, 1);
        std::memcpy(&mult, fwp + 4, 4);
        std::memcpy(&model_type, fwp + 8, 4);
        std::memcpy(&has_vocab, fwp + 12, 1);
        if (model_type != 0) {
            std::fprintf(stderr,
                         "kenlm binary: model_type %u unsupported (only "
                         "PROBING=0); rebuild with prep lm-binary\n",
                         model_type);
            return false;
        }
        if (!has_vocab) {
            std::fprintf(stderr,
                         "kenlm binary has no stored vocabulary strings; "
                         "cannot map lexicon words\n");
            return false;
        }
        order = ord8;
        if (order <= 0) return false;
        std::vector<uint64_t> counts(order);
        f.read(reinterpret_cast<char*>(counts.data()), 8 * order);
        size_t pos = KENLM_SANITY + 20 + 8 * order;
        size_t pad = (8 - pos % 8) % 8;
        f.seekg(pad, std::ios::cur);
        // vocabulary: header + probing table (we only need bound; ids are
        // recovered from the trailing strings section)
        uint32_t bound;
        char vhead[8];
        f.read(vhead, 8);
        if (!f) return false;
        std::memcpy(&bound, vhead, 4);
        uint64_t vbuckets = kenlm_buckets(bound, mult);
        f.seekg(vbuckets * sizeof(KVocabEntry), std::ios::cur);
        // unigrams: id-indexed ProbBackoff array
        k_unigram.assign(bound, {float(-100.0 * ln10), 0.0f});
        std::vector<float> uni(2 * bound);
        f.read(reinterpret_cast<char*>(uni.data()), 8 * bound);
        if (!f) return false;
        for (uint32_t i = 0; i < bound; i++) {
            k_unigram[i] = {float(uni[2 * i] * ln10),
                            float(uni[2 * i + 1] * ln10)};
        }
        // middle + longest probing tables
        k_middle.clear();
        for (int n = 2; n < order; n++) {
            uint64_t b = kenlm_buckets(counts[n - 1], mult);
            std::vector<KProbEntry> t(b);
            f.read(reinterpret_cast<char*>(t.data()), b * sizeof(KProbEntry));
            if (!f) return false;
            for (auto& e : t) {
                if (e.key) {
                    e.prob = float(e.prob * ln10);
                    e.backoff = float(e.backoff * ln10);
                }
            }
            k_middle.push_back(std::move(t));
        }
        k_longest.clear();
        if (order >= 2) {
            uint64_t b = kenlm_buckets(counts[order - 1], mult);
            k_longest.resize(b);
            f.read(reinterpret_cast<char*>(k_longest.data()),
                   b * sizeof(KProbEntry));
            if (!f) return false;
            for (auto& e : k_longest)
                if (e.key) e.prob = float(e.prob * ln10);
        }
        // trailing vocab strings, null-terminated, in id order
        vocab.clear();
        std::string blob((std::istreambuf_iterator<char>(f)),
                         std::istreambuf_iterator<char>());
        size_t off = 0;
        for (uint32_t id = 0; id < bound && off < blob.size(); id++) {
            size_t end = blob.find('\0', off);
            if (end == std::string::npos) break;
            vocab.emplace(blob.substr(off, end - off), int32_t(id));
            off = end + 1;
        }
        kenlm_mode = true;
        return vocab.size() == bound;
    }

    // write the probing binary from the parsed ARPA (`grams` + `vocab`).
    // KenLM convention: word id 0 is <unk>; other words keep ARPA 1-gram
    // order.  Role of kenlm's build_binary for our own artifacts AND the
    // fixture generator for the reader's parity tests.
    bool save_kenlm(const char* path) const {
        if (kenlm_mode) return false;   // already compiled
        const double ln10 = std::log(10.0);
        // our id -> kenlm id (unk pinned to 0)
        std::vector<const std::string*> by_id(vocab.size());
        for (auto& kv : vocab) by_id[kv.second] = &kv.first;
        std::vector<uint32_t> remap(vocab.size());
        std::vector<const std::string*> words;   // kenlm id order
        words.push_back(nullptr);                 // slot 0 = <unk>
        bool have_unk = false;
        for (size_t i = 0; i < by_id.size(); i++) {
            if (*by_id[i] == "<unk>") {
                remap[i] = 0;
                words[0] = by_id[i];
                have_unk = true;
            } else {
                remap[i] = uint32_t(words.size());
                words.push_back(by_id[i]);
            }
        }
        static const std::string UNK = "<unk>";
        if (!words[0]) words[0] = &UNK;
        uint32_t bound = uint32_t(words.size());

        std::vector<uint64_t> counts(order, 0);
        for (auto& kv : grams)
            counts[kv.first.size() / sizeof(int32_t) - 1]++;
        counts[0] = bound;   // every id gets a unigram slot (unk included)

        std::ofstream f(path, std::ios::binary);
        if (!f) return false;
        char sanity[KENLM_SANITY] = {0};
        std::memcpy(sanity, KENLM_MAGIC, sizeof(KENLM_MAGIC));
        float ref_f[3] = {0.0f, 1.0f, -0.5f};
        std::memcpy(sanity + KENLM_MAGIC_FIELD, ref_f, 12);
        uint32_t ref_w[2] = {1u, 0xFFFFFFFFu};
        std::memcpy(sanity + KENLM_MAGIC_FIELD + 12, ref_w, 8);
        uint64_t one64 = 1;
        std::memcpy(sanity + 80, &one64, 8);
        f.write(sanity, KENLM_SANITY);
        char fwp[20] = {0};
        uint8_t ord8 = uint8_t(order);
        float mult = float(KENLM_DEFAULT_MULT);
        uint32_t model_type = 0, search_version = 0;
        uint8_t has_vocab = 1;
        std::memcpy(fwp + 0, &ord8, 1);
        std::memcpy(fwp + 4, &mult, 4);
        std::memcpy(fwp + 8, &model_type, 4);
        std::memcpy(fwp + 12, &has_vocab, 1);
        std::memcpy(fwp + 16, &search_version, 4);
        f.write(fwp, 20);
        f.write(reinterpret_cast<const char*>(counts.data()), 8 * order);
        size_t pos = KENLM_SANITY + 20 + 8 * order;
        char zeros[8] = {0};
        f.write(zeros, (8 - pos % 8) % 8);

        char vhead[8] = {0};
        std::memcpy(vhead, &bound, 4);
        vhead[4] = 1;   // saw_unk
        f.write(vhead, 8);
        std::vector<KVocabEntry> vtab(kenlm_buckets(bound, mult),
                                      KVocabEntry{0, 0, 0});
        for (uint32_t id = 0; id < bound; id++) {
            uint64_t h = murmur64a(words[id]->data(), words[id]->size(), 0);
            probe_insert(vtab, KVocabEntry{h, id, 0});
        }
        f.write(reinterpret_cast<const char*>(vtab.data()),
                vtab.size() * sizeof(KVocabEntry));

        std::vector<float> uni(2 * bound);
        for (uint32_t i = 0; i < bound; i++) {
            uni[2 * i] = -100.0f;        // log10 floor for id without 1-gram
            uni[2 * i + 1] = 0.0f;
        }
        std::vector<std::vector<KProbEntry>> mids;
        for (int n = 2; n < order; n++)
            mids.emplace_back(kenlm_buckets(counts[n - 1], mult),
                              KProbEntry{0, 0.0f, 0.0f});
        std::vector<KProbEntry> longest;
        if (order >= 2)
            longest.assign(kenlm_buckets(counts[order - 1], mult),
                           KProbEntry{0, 0.0f, 0.0f});
        std::vector<int32_t> kids;
        for (auto& kv : grams) {
            size_t n = kv.first.size() / sizeof(int32_t);
            const int32_t* ids =
                reinterpret_cast<const int32_t*>(kv.first.data());
            kids.resize(n);
            for (size_t i = 0; i < n; i++) kids[i] = int32_t(remap[ids[i]]);
            float p10 = float(kv.second.first / ln10);
            float b10 = float(kv.second.second / ln10);
            if (n == 1) {
                uni[2 * kids[0]] = p10;
                uni[2 * kids[0] + 1] = b10;
            } else if (int(n) == order) {
                probe_insert(longest,
                             KProbEntry{kenlm_chain(kids.data(), n), p10, 0});
            } else {
                probe_insert(mids[n - 2],
                             KProbEntry{kenlm_chain(kids.data(), n), p10,
                                        b10});
            }
        }
        f.write(reinterpret_cast<const char*>(uni.data()), 8 * bound);
        for (auto& t : mids)
            f.write(reinterpret_cast<const char*>(t.data()),
                    t.size() * sizeof(KProbEntry));
        if (order >= 2)
            f.write(reinterpret_cast<const char*>(longest.data()),
                    longest.size() * sizeof(KProbEntry));
        for (uint32_t id = 0; id < bound; id++) {
            f.write(words[id]->data(), words[id]->size());
            f.write(zeros, 1);
        }
        (void)have_unk;
        return bool(f);
    }

    bool load(const char* path) {
        {
            std::ifstream fb(path, std::ios::binary);
            if (!fb) return false;
            char magic[8] = {0};
            fb.read(magic, 8);
            if (fb && std::memcmp(magic, BIN_MAGIC, 8) == 0)
                return load_binary(fb);
            char kmagic[sizeof(KENLM_MAGIC)] = {0};
            fb.seekg(0);
            fb.read(kmagic, sizeof(KENLM_MAGIC) - 1);
            if (fb && std::memcmp(kmagic, KENLM_MAGIC,
                                  sizeof(KENLM_MAGIC) - 1) == 0)
                return load_kenlm(fb);
        }
        std::ifstream f(path);
        if (!f) return false;
        std::string line;
        int cur_order = 0;
        const double ln10 = std::log(10.0);
        while (std::getline(f, line)) {
            if (line.empty()) continue;
            if (line[0] == '\\') {
                if (line.rfind("\\end\\", 0) == 0) break;
                int n = 0;
                if (sscanf(line.c_str(), "\\%d-grams:", &n) == 1) {
                    cur_order = n;
                    order = std::max(order, n);
                }
                continue;
            }
            if (cur_order == 0) continue;  // header / \data\ section
            std::istringstream ss(line);
            double logp;
            if (!(ss >> logp)) continue;
            std::vector<int32_t> ids;
            ids.reserve(cur_order);
            std::string w;
            for (int i = 0; i < cur_order; i++) {
                if (!(ss >> w)) break;
                auto it = vocab.find(w);
                int32_t id;
                if (it == vocab.end()) {
                    id = (int32_t)vocab.size();
                    vocab.emplace(w, id);
                } else {
                    id = it->second;
                }
                ids.push_back(id);
            }
            double backoff = 0.0;
            ss >> backoff;  // absent -> stays 0
            grams[key(ids)] = {float(logp * ln10), float(backoff * ln10)};
        }
        return order > 0;
    }

    // score word given context (natural log), with backoff; returns new
    // context (truncated to order-1)
    double score(std::vector<int32_t>& ctx, int32_t wid) const {
        if (wid < 0) return -10.0;  // unk not in vocab at all
        std::vector<int32_t> full(ctx);
        full.push_back(wid);
        // longest-match backoff: P(w|ctx) = P(w|ctx') + sum(backoffs dropped)
        double bo_sum = 0.0;
        double p, b;
        for (size_t start = 0; start < full.size(); start++) {
            size_t n = full.size() - start;
            if (lookup(full.data() + start, n, &p, &b)) {
                // new context = last (order-1) words of full
                ctx = full;
                if ((int)ctx.size() >= order)
                    ctx.erase(ctx.begin(), ctx.end() - (order - 1));
                return p + bo_sum;
            }
            // add backoff of the dropped context prefix ctx[start..]
            if (n >= 2 && lookup(full.data() + start, n - 1, &p, &b))
                bo_sum += b;
        }
        ctx = full;
        if ((int)ctx.size() >= order)
            ctx.erase(ctx.begin(), ctx.end() - (order - 1));
        return -23.0 + bo_sum;  // ~log(1e-10): token absent everywhere
    }
};

// ------------------------------------------------------------- lexicon trie
struct TrieNode {
    std::unordered_map<int32_t, int32_t> children;  // token -> node index
    std::vector<int32_t> words;                     // lm word ids ending here
};

struct Decoder {
    NGramLM lm;
    std::vector<TrieNode> trie;
    std::unordered_map<std::string, int32_t> token_ids;
    int32_t blank = 0, sep = -1;
    double lm_weight = 0.0, word_score = 0.0;
    int beam = 50;
    bool has_lm = false;

    int32_t trie_add_path(const std::vector<int32_t>& toks) {
        int32_t node = 0;
        for (int32_t t : toks) {
            auto it = trie[node].children.find(t);
            if (it == trie[node].children.end()) {
                int32_t next = (int32_t)trie.size();
                trie[node].children.emplace(t, next);
                trie.emplace_back();
                node = next;
            } else {
                node = it->second;
            }
        }
        return node;
    }

    // lexicon line: "word tok1 tok2 ..." (tokens are vocab symbols)
    bool load_lexicon(const char* path) {
        std::ifstream f(path);
        if (!f) return false;
        trie.clear();
        trie.emplace_back();  // root
        std::string line;
        while (std::getline(f, line)) {
            if (line.empty()) continue;
            std::istringstream ss(line);
            std::string word, tok;
            ss >> word;
            std::vector<int32_t> toks;
            while (ss >> tok) {
                auto it = token_ids.find(tok);
                if (it == token_ids.end()) { toks.clear(); break; }
                toks.push_back(it->second);
            }
            if (toks.empty()) continue;
            int32_t node = trie_add_path(toks);
            int32_t wid = has_lm ? lm.word_id(word) : (int32_t)trie[node].words.size();
            trie[node].words.push_back(wid);
        }
        return trie.size() > 1;
    }
};

// beam hypothesis
struct Hyp {
    int32_t trie_node = 0;
    int32_t last_tok = -1;            // last emitted (non-blank) token
    double p_b = NEG_INF;             // prob ending in blank
    double p_nb = NEG_INF;            // prob ending in non-blank
    double lm_score = 0.0;            // accumulated weighted LM + word bonuses
    std::vector<int32_t> lm_ctx;
    std::vector<int32_t> tokens;      // emitted token sequence

    double total() const { return log_add(p_b, p_nb) + lm_score; }
};

struct HypKey {
    std::string s;
    bool operator==(const HypKey& o) const { return s == o.s; }
};
struct HypKeyHash {
    size_t operator()(const HypKey& k) const { return std::hash<std::string>()(k.s); }
};

HypKey make_key(const Hyp& h) {
    // length-prefixed: a raw separator byte would be ambiguous (token bytes
    // can contain any value), letting distinct (tokens, lm_ctx) pairs
    // serialize identically and merge wrongly
    HypKey k;
    k.s.reserve((h.tokens.size() + h.lm_ctx.size() + 1) * sizeof(int32_t));
    int32_t n = (int32_t)h.tokens.size();
    k.s.append(reinterpret_cast<const char*>(&n), sizeof(int32_t));
    k.s.append(reinterpret_cast<const char*>(h.tokens.data()),
               h.tokens.size() * sizeof(int32_t));
    k.s.append(reinterpret_cast<const char*>(h.lm_ctx.data()),
               h.lm_ctx.size() * sizeof(int32_t));
    return k;
}

}  // namespace

namespace {

// run the lexicon beam over one utterance and return the FINALIZED
// hypotheses (word-boundary closure + dangling-word penalty applied),
// unsorted.  Shared by the 1-best and N-best entry points.
std::vector<Hyp> lexdec_finals(Decoder* d, const float* lp, int64_t T,
                               int64_t V) {
    std::vector<Hyp> beam_hyps(1);
    beam_hyps[0].p_b = 0.0;

    std::unordered_map<HypKey, Hyp, HypKeyHash> next;
    for (int64_t t = 0; t < T; t++) {
        next.clear();
        const float* row = lp + t * V;
        auto merge = [&](Hyp&& h) {
            HypKey k = make_key(h);
            auto it = next.find(k);
            if (it == next.end()) {
                next.emplace(std::move(k), std::move(h));
            } else {
                it->second.p_b = log_add(it->second.p_b, h.p_b);
                it->second.p_nb = log_add(it->second.p_nb, h.p_nb);
            }
        };

        for (const Hyp& h : beam_hyps) {
            double p_tot = log_add(h.p_b, h.p_nb);
            // 1) blank
            {
                Hyp nh = h;
                nh.p_b = p_tot + row[d->blank];
                nh.p_nb = NEG_INF;
                merge(std::move(nh));
            }
            // 2) repeat last non-blank token (stay in same prefix)
            if (h.last_tok >= 0 && h.p_nb > NEG_INF) {
                Hyp nh = h;
                nh.p_b = NEG_INF;
                nh.p_nb = h.p_nb + row[h.last_tok];
                merge(std::move(nh));
            }
            // 3) extend with a child token of the trie node
            for (const auto& [tok, child] : d->trie[h.trie_node].children) {
                // emitting the same token right after itself requires a blank
                double base = (tok == h.last_tok) ? h.p_b : p_tot;
                if (base <= NEG_INF) continue;
                Hyp nh = h;
                nh.p_b = NEG_INF;
                nh.p_nb = base + row[tok];
                nh.trie_node = child;
                nh.last_tok = tok;
                nh.tokens.push_back(tok);
                merge(std::move(nh));
            }
            // 4) word boundary: current node completes a word, emit separator
            if (d->sep >= 0 && !d->trie[h.trie_node].words.empty()) {
                double base = (d->sep == h.last_tok) ? h.p_b : p_tot;
                if (base > NEG_INF) {
                    Hyp nh = h;
                    nh.p_b = NEG_INF;
                    nh.p_nb = base + row[d->sep];
                    nh.last_tok = d->sep;
                    nh.tokens.push_back(d->sep);
                    nh.trie_node = 0;  // word done: back to root
                    if (d->has_lm) {
                        int32_t wid = d->trie[h.trie_node].words[0];
                        nh.lm_score += d->lm_weight *
                                       d->lm.score(nh.lm_ctx, wid) +
                                       d->word_score;
                    } else {
                        nh.lm_score += d->word_score;
                    }
                    merge(std::move(nh));
                }
            }
        }

        // prune to beam
        beam_hyps.clear();
        beam_hyps.reserve(next.size());
        for (auto& [k, h] : next) beam_hyps.push_back(std::move(h));
        std::sort(beam_hyps.begin(), beam_hyps.end(),
                  [](const Hyp& a, const Hyp& b) { return a.total() > b.total(); });
        if ((int)beam_hyps.size() > d->beam) beam_hyps.resize(d->beam);
    }

    // finalize: prefer hypotheses that END at a word boundary (trie root) or
    // complete a word; apply the final word's LM score if pending
    std::vector<Hyp> finals;
    finals.reserve(beam_hyps.size());
    for (const Hyp& h : beam_hyps) {
        Hyp f = h;
        if (f.trie_node != 0 && !d->trie[f.trie_node].words.empty()) {
            if (d->has_lm) {
                int32_t wid = d->trie[f.trie_node].words[0];
                f.lm_score += d->lm_weight * d->lm.score(f.lm_ctx, wid) +
                              d->word_score;
            } else {
                f.lm_score += d->word_score;
            }
            f.trie_node = 0;
        } else if (f.trie_node != 0) {
            f.lm_score += -1e4;  // dangling partial word: heavily penalized
        }
        finals.push_back(std::move(f));
    }
    return finals;
}

}  // namespace

extern "C" {

void* lexdec_create(const char* lexicon_path, const char* arpa_path,
                    const char** vocab, int64_t V, int32_t blank,
                    int32_t sep, double lm_weight, double word_score,
                    int32_t beam) {
    auto* d = new Decoder();
    d->blank = blank;
    d->sep = sep;
    d->lm_weight = lm_weight;
    d->word_score = word_score;
    d->beam = beam;
    for (int64_t i = 0; i < V; i++) d->token_ids[vocab[i]] = (int32_t)i;
    if (arpa_path && arpa_path[0]) d->has_lm = d->lm.load(arpa_path);
    if (!d->load_lexicon(lexicon_path)) { delete d; return nullptr; }
    return d;
}

void lexdec_free(void* p) { delete static_cast<Decoder*>(p); }

// Compile a text ARPA LM into the fast binary format (KenLM build_binary's
// role).  Returns 0 on success.
int32_t lexlm_build_binary(const char* arpa_path, const char* bin_path) {
    NGramLM lm;
    if (!lm.load(arpa_path)) return 1;
    return lm.save_binary(bin_path) ? 0 : 2;
}

// Compile a text ARPA LM into KenLM's probing binary layout (format
// version 5, PROBING) — readable by this library AND by KenLM-based
// stacks.  Returns 0 on success.
int32_t lexlm_build_kenlm_binary(const char* arpa_path,
                                 const char* bin_path) {
    NGramLM lm;
    if (!lm.load(arpa_path)) return 1;
    return lm.save_kenlm(bin_path) ? 0 : 2;
}

// Decode one utterance.  lp: [T, V] natural-log posteriors.  Returns number
// of output tokens written to out_tokens (caller capacity T); out_score gets
// the total (acoustic + weighted LM) score of the 1-best.
int64_t lexdec_decode(void* p, const float* lp, int64_t T, int64_t V,
                      int32_t* out_tokens, double* out_score) {
    auto* d = static_cast<Decoder*>(p);
    std::vector<Hyp> finals = lexdec_finals(d, lp, T, V);
    double best = NEG_INF;
    const Hyp* best_h = nullptr;
    for (const Hyp& h : finals) {
        if (h.total() > best) { best = h.total(); best_h = &h; }
    }
    if (!best_h) { *out_score = NEG_INF; return 0; }
    int64_t n = std::min<int64_t>((int64_t)best_h->tokens.size(), T);
    for (int64_t i = 0; i < n; i++) out_tokens[i] = best_h->tokens[i];
    *out_score = best;
    return n;
}

// N-best variant: writes up to `nbest` finalized hypotheses sorted by
// total score (acoustic + weighted LM), out_tokens [nbest, T] row-major.
// Feeds the lexicon-constrained arm of the two-pass attention rescore.
int64_t lexdec_decode_nbest(void* p, const float* lp, int64_t T, int64_t V,
                            int32_t nbest, int32_t* out_tokens,
                            int32_t* out_lens, double* out_scores) {
    auto* d = static_cast<Decoder*>(p);
    std::vector<Hyp> finals = lexdec_finals(d, lp, T, V);
    // Beam entries keyed by (tokens, LM context) can finalize to identical
    // token sequences; dedupe by sequence (keep the max-scoring entry) so
    // duplicates don't occupy N-best slots fed to the attention rescore.
    {
        std::map<std::vector<int32_t>, size_t> best_of;
        std::vector<Hyp> uniq;
        for (Hyp& f : finals) {
            auto it = best_of.find(f.tokens);
            if (it == best_of.end()) {
                best_of.emplace(f.tokens, uniq.size());
                uniq.push_back(std::move(f));
            } else if (f.total() > uniq[it->second].total()) {
                uniq[it->second] = std::move(f);
            }
        }
        finals = std::move(uniq);
    }
    std::sort(finals.begin(), finals.end(),
              [](const Hyp& a, const Hyp& b) { return a.total() > b.total(); });
    int64_t n = std::min<int64_t>(nbest, (int64_t)finals.size());
    for (int64_t i = 0; i < n; i++) {
        int64_t m = std::min<int64_t>((int64_t)finals[i].tokens.size(), T);
        for (int64_t j = 0; j < m; j++)
            out_tokens[i * T + j] = finals[i].tokens[j];
        out_lens[i] = (int32_t)m;
        out_scores[i] = finals[i].total();
    }
    return n;
}

}  // extern "C"

// --------------------------------------------- open-vocabulary N-best beam
// Lexicon-free CTC prefix beam search (Graves 2012 / Hannun 2014) keeping the
// N best label prefixes with their total log-probabilities.  This is pass 1
// of the two-pass CTC -> attention-rescore decode: the reference computes its
// CTC emissions from the same encoder head the joint beam uses (reference
// SpeechT5/speecht5/models/modules/encoder.py:101-111,174-179), and its
// SpeechLM eval path decodes those emissions with no AR loop at all
// (reference SpeechLM/speechlm/infer.py:29-33); rescoring the CTC N-best with
// one teacher-forced decoder pass recovers joint-beam quality at
// encoder-forward cost.

namespace {

// Prefixes live in a trie so a hypothesis is one int node id: merges hash an
// int instead of re-serializing the whole token sequence (O(1) vs O(len) per
// expansion — the naive keying is quadratic in hypothesis length over the
// frame loop, and dominates decode for long utterances).
struct PrefixNode {
    int32_t parent = -1;
    int32_t tok = -1;                     // token emitted to reach this node
    int32_t depth = 0;
    std::unordered_map<int32_t, int32_t> children;
};

struct OHyp {
    int32_t node = 0;                     // prefix trie node (0 = empty)
    double p_b = NEG_INF;                 // prob of prefix ending in blank
    double p_nb = NEG_INF;                // prob of prefix ending in non-blank
    double total() const { return log_add(p_b, p_nb); }
};

int64_t nbest_impl(const float* lp, int64_t T, int64_t V,
                   int32_t blank, int32_t beam, int32_t nbest, int32_t topk,
                   double blank_thresh, int64_t out_stride,
                   int32_t* out_tokens, int32_t* out_lens,
                   double* out_scores) {
    std::vector<PrefixNode> trie(1);      // node 0 = empty prefix
    auto child = [&trie](int32_t node, int32_t tok) -> int32_t {
        auto it = trie[node].children.find(tok);
        if (it != trie[node].children.end()) return it->second;
        int32_t id = (int32_t)trie.size();
        trie[node].children.emplace(tok, id);
        PrefixNode c;
        c.parent = node;
        c.tok = tok;
        c.depth = trie[node].depth + 1;
        trie.push_back(std::move(c));
        return id;
    };

    std::vector<OHyp> hyps(1);
    hyps[0].p_b = 0.0;
    std::vector<int32_t> cand(V);
    // per-frame dedup without a hash map: slot_epoch/slot_idx are indexed by
    // trie node id and stamped with the frame number — O(1) merges, no
    // per-frame allocation churn (the hash-map version spent most of its
    // time in node allocation + hashing at ~70k merges/utterance)
    std::vector<OHyp> pool;
    std::vector<int64_t> slot_epoch;
    std::vector<int32_t> slot_idx;

    for (int64_t t = 0; t < T; t++) {
        const float* row = lp + t * V;
        // blank-dominated frame: every transition that changes the prefix
        // carries at most 1 - P(blank) mass, so fold the frame into the
        // stay transitions only (blank + repeat-last) — no extensions, no
        // merge, no sort.  Trained CTC models emit ~90% such frames, and
        // prefixes stay unique so the in-place update is exact for the
        // transitions kept.  blank_thresh >= 0 disables (log p < 0 always).
        if (blank_thresh < 0.0 && row[blank] > blank_thresh) {
            for (OHyp& h : hyps) {
                double p_tot = h.total();
                int32_t last = trie[h.node].tok;
                double nb = (last >= 0 && h.p_nb > NEG_INF)
                                ? h.p_nb + row[last]
                                : NEG_INF;
                h.p_b = p_tot + row[blank];
                h.p_nb = nb;
            }
            continue;
        }
        int64_t K = (topk > 0 && (int64_t)topk < V) ? topk : V;
        for (int64_t v = 0; v < V; v++) cand[v] = (int32_t)v;
        if (K < V) {
            std::partial_sort(
                cand.begin(), cand.begin() + K, cand.end(),
                [&](int32_t a, int32_t b) { return row[a] > row[b]; });
        }

        pool.clear();
        if (slot_epoch.size() < trie.size() + hyps.size() * (K + 1)) {
            slot_epoch.resize(trie.size() + hyps.size() * (K + 1), -1);
            slot_idx.resize(slot_epoch.size(), 0);
        }
        auto merge = [&](int32_t node, double p_b, double p_nb) {
            if ((size_t)node >= slot_epoch.size()) {
                slot_epoch.resize(
                    std::max<size_t>(node + 1, slot_epoch.size() * 2), -1);
                slot_idx.resize(slot_epoch.size(), 0);
            }
            if (slot_epoch[node] == t) {
                OHyp& g = pool[slot_idx[node]];
                g.p_b = log_add(g.p_b, p_b);
                g.p_nb = log_add(g.p_nb, p_nb);
            } else {
                slot_epoch[node] = t;
                slot_idx[node] = (int32_t)pool.size();
                pool.push_back(OHyp{node, p_b, p_nb});
            }
        };

        for (const OHyp& h : hyps) {
            double p_tot = h.total();
            int32_t last = trie[h.node].tok;  // -1 at the root
            // blank / repeat-last keep the prefix unchanged
            merge(h.node, p_tot + row[blank],
                  (last >= 0 && h.p_nb > NEG_INF) ? h.p_nb + row[last]
                                                  : NEG_INF);
            for (int64_t ci = 0; ci < K; ci++) {
                int32_t tok = cand[ci];
                if (tok == blank) continue;
                // emitting `last` again right away requires a blank between
                double base = (tok == last) ? h.p_b : p_tot;
                if (base <= NEG_INF) continue;
                merge(child(h.node, tok), NEG_INF, base + row[tok]);
            }
        }

        hyps.assign(pool.begin(), pool.end());
        std::sort(hyps.begin(), hyps.end(),
                  [](const OHyp& a, const OHyp& b) {
                      return a.total() > b.total();
                  });
        if ((int64_t)hyps.size() > beam) hyps.resize(beam);
    }

    // Blank-skipped frames after the last per-frame sort update scores in
    // place, so the beam can end non-descending (trailing silence is exactly
    // the blank-dominated case).  Restore the documented descending contract
    // before emitting — matches ctc_nbest_py's final sorted().
    std::sort(hyps.begin(), hyps.end(),
              [](const OHyp& a, const OHyp& b) { return a.total() > b.total(); });

    int64_t n = std::min<int64_t>(nbest, (int64_t)hyps.size());
    for (int64_t i = 0; i < n; i++) {
        int64_t m = std::min<int64_t>((int64_t)trie[hyps[i].node].depth, T);
        int32_t node = hyps[i].node;
        // walk parents; skip tokens beyond the T clamp (cannot happen: depth
        // grows by <= 1 per frame, so depth <= T always)
        for (int64_t j = m - 1; j >= 0; j--) {
            out_tokens[i * out_stride + j] = trie[node].tok;
            node = trie[node].parent;
        }
        out_lens[i] = (int32_t)m;
        out_scores[i] = hyps[i].total();
    }
    return n;
}

}  // namespace

extern "C" {

// lp: [T, V] natural-log posteriors.  Writes up to `nbest` hypotheses:
// out_tokens is [nbest, T] row-major, out_lens[i] the token count of row i,
// out_scores[i] its total log-prob (descending).  `topk > 0` restricts each
// frame's extension candidates to the top-k emissions (blank and the
// repeat-last transition are always considered).  Returns the number of
// hypotheses written.
int64_t ctc_nbest(const float* lp, int64_t T, int64_t V,
                  int32_t blank, int32_t beam, int32_t nbest, int32_t topk,
                  double blank_thresh,
                  int32_t* out_tokens, int32_t* out_lens,
                  double* out_scores) {
    return nbest_impl(lp, T, V, blank, beam, nbest, topk, blank_thresh, T,
                      out_tokens, out_lens, out_scores);
}

// Batched N-best over [B, Tmax, V] posteriors with per-utterance frame
// counts `lens`.  Utterances are independent, so they decode on a worker
// pool (`n_threads <= 0` -> hardware concurrency).  out_tokens is
// [B, nbest, Tmax]; out_counts[b] gets the hypothesis count of row b.
int64_t ctc_nbest_batch(const float* lp, const int32_t* lens, int64_t B,
                        int64_t Tmax, int64_t V, int32_t blank, int32_t beam,
                        int32_t nbest, int32_t topk, double blank_thresh,
                        int32_t n_threads,
                        int32_t* out_tokens, int32_t* out_lens,
                        double* out_scores, int32_t* out_counts) {
    if (n_threads <= 0) {
        unsigned hc = std::thread::hardware_concurrency();
        n_threads = hc ? (int32_t)hc : 1;
    }
    n_threads = std::max(1, std::min<int32_t>(n_threads, (int32_t)B));
    auto work = [&](int64_t b0) {
        for (int64_t b = b0; b < B; b += n_threads) {
            out_counts[b] = (int32_t)nbest_impl(
                lp + b * Tmax * V, lens[b], V, blank, beam, nbest, topk,
                blank_thresh, Tmax,
                out_tokens + b * (int64_t)nbest * Tmax,
                out_lens + b * nbest, out_scores + b * nbest);
        }
    };
    if (n_threads == 1) {
        work(0);
    } else {
        std::vector<std::thread> pool;
        pool.reserve(n_threads);
        for (int32_t i = 0; i < n_threads; i++) pool.emplace_back(work, i);
        for (auto& th : pool) th.join();
    }
    return B;
}

}  // extern "C"
