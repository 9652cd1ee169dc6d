// Native response-matrix builder: long-format CSV -> dense packed int8 codes.
//
// The framework's data-loading hot path (SURVEY.md section 3.3 "Real-dataset
// loaders"): DuoLingo-scale dumps are ~13M rows; the pure-Python csv module
// takes minutes there. This parser does the same reduction as
// vibo_tpu.data.loaders.long_to_matrix — dedupe (person,item) keeping the
// last response, filter persons/items with fewer than min observed responses,
// sort ids lexicographically, emit packed codes (0=missing, 1=incorrect,
// 2=correct) ready for vibo_tpu.ops.pallas_elbo.pack_responses consumers —
// measured 4.4x the Python path end-to-end on the 13M-row DuoLingo-scale
// file on this image's single core (RESULTS.md "At-scale raw ingestion").
//
// Binarization modes (so the datasets that motivated the native path —
// DuoLingo, WordBank, Gradescope — actually take it; round-1 advisor
// finding):
//   0  numeric value > 0.5                                (pisa, critlangacq)
//   1  numeric value >= numeric denom column               (gradescope)
//   2  like 1, but the denom column is optional (treated as 1.0 when the
//      header lacks it)                                    (duolingo)
//   3  trimmed lowercase string equality with `match`      (wordbank)
//
// Robustness (round-1 advisor findings): lines are read with getline so
// arbitrarily long rows never split mid-record, and numeric fields parse
// strictly (strtod + full-consumption check) with a surfaced error count —
// the Python binding raises, matching the Python path's float() behavior —
// instead of atof silently coercing garbage to "incorrect".
//
// Performance (round-3, measured on the 13M-row DuoLingo-scale file):
// the first version spent its time on per-field substr allocations and on a
// node-based unordered_map<pair,int8> that rehashed its way to 12.7M
// entries — 110 s, only 2.3x the Python path. The hot loop now (a) splits
// fields IN PLACE by NUL-punching the getline buffer (zero allocations per
// row), (b) interns ids through a reused scratch key (allocation-free
// lookups), and (c) replaces the pair hash map with a flat
// (key, seq, code) record vector + one std::sort, deduping keep-LAST by
// sequence number in a linear scan. The measured end-to-end numbers for
// 13M rows on one core live in RESULTS.md ("At-scale raw ingestion").
//
// C ABI (handle-based), consumed via ctypes from vibo_tpu/data/native.py:
//   rl_parse(path, person_col, item_col, correct_col, min_p, min_i)
//   rl_parse_ex(path, person_col, item_col, correct_col, denom_col, match,
//               mode, min_p, min_i)
//   rl_num_persons/rl_num_items(handle)
//   rl_parse_errors(handle)              // count of unparseable rows
//   rl_fill(handle, int8* out)           // row-major persons x items
//   rl_person_ids/rl_item_ids(handle)    // newline-joined sorted ids
//   rl_error(handle) / rl_free(handle)
//
// Semantics are byte-identical to the Python implementation (asserted in
// tests/test_native.py). Python remains the fallback when the .so is absent.

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#ifdef __linux__
#include <sys/mman.h>
#include <sys/stat.h>
#endif

namespace {

// Advise transparent huge pages for a buffer about to be written for the
// first time. This image runs THP in `madvise` mode inside a Firecracker
// VM where 4k-page first-touch faults are hypervisor-bound (~20-30 MB/s
// measured); 2M faults are ~100x faster. Best effort, correctness-neutral.
void advise_hugepages(void* p, size_t n) {
#ifdef __linux__
    const uintptr_t huge = 2u << 20;
    uintptr_t a = (reinterpret_cast<uintptr_t>(p) + huge - 1) & ~(huge - 1);
    size_t skip = a - reinterpret_cast<uintptr_t>(p);
    if (n > skip + huge)
        madvise(reinterpret_cast<void*>(a), n - skip, MADV_HUGEPAGE);
#else
    (void)p; (void)n;
#endif
}

}  // namespace

namespace {

struct Cell {
    uint32_t row;
    uint32_t col;
    int8_t code;  // 1=incorrect, 2=correct (missing cells are not stored)
};

struct Loader {
    std::vector<std::string> persons;  // sorted kept person ids
    std::vector<std::string> items;    // sorted kept item ids
    std::vector<Cell> cells;           // observed cells, row-major sorted
    std::string error;
    std::string person_blob, item_blob;
    int64_t parse_errors = 0;
};

// One observed cell in file order; key = person_id << 32 | item_id. Sorting
// by (key, seq) groups duplicate (person, item) pairs with the LAST file
// occurrence at the group's end — the dedupe semantics of the Python path's
// dict assignment — without a 13M-entry node-based hash map.
struct Rec {
    uint64_t key;
    uint32_t seq;
    int8_t code;
};

// Split one CSV line IN PLACE: replaces each ',' (and the trailing
// newline) with NUL and records field starts. Zero allocations per row.
// (No quoted-comma support: the response dumps we target are plain.)
void split_line_inplace(char* line, std::vector<char*>& out) {
    out.clear();
    char* p = line;
    out.push_back(p);
    for (; *p; ++p) {
        if (*p == ',') {
            *p = '\0';
            out.push_back(p + 1);
        } else if (*p == '\n' || *p == '\r') {
            *p = '\0';
            break;
        }
    }
}

// Strict numeric parse: the whole (trimmed) field must be consumed.
bool parse_number(const char* s, double* out) {
    while (*s && std::isspace(static_cast<unsigned char>(*s))) ++s;
    if (!*s) return false;
    char* end = nullptr;
    double v = std::strtod(s, &end);
    if (end == s) return false;
    while (*end && std::isspace(static_cast<unsigned char>(*end))) ++end;
    if (*end) return false;
    *out = v;
    return true;
}

void lower_trim_into(const char* s, std::string& out) {
    out.clear();
    const char* a = s;
    while (*a && std::isspace(static_cast<unsigned char>(*a))) ++a;
    const char* b = a + std::strlen(a);
    while (b > a && std::isspace(static_cast<unsigned char>(b[-1]))) --b;
    for (; a < b; ++a)
        out.push_back(static_cast<char>(std::tolower(
            static_cast<unsigned char>(*a))));
}

std::string lower_trim(const std::string& s) {
    std::string out;
    lower_trim_into(s.c_str(), out);
    return out;
}

// Intern through a REUSED scratch string: map.find allocates nothing once
// scratch's capacity covers the longest id; only genuinely new ids copy.
uint32_t intern(std::unordered_map<std::string, uint32_t>& map,
                std::vector<std::string>& names, const char* key,
                std::string& scratch) {
    scratch.assign(key);
    auto it = map.find(scratch);
    if (it != map.end()) return it->second;
    uint32_t id = static_cast<uint32_t>(names.size());
    map.emplace(scratch, id);
    names.push_back(scratch);
    return id;
}

}  // namespace

extern "C" {

void* rl_parse_ex(const char* path, const char* person_col,
                  const char* item_col, const char* correct_col,
                  const char* denom_col, const char* match, int mode,
                  int min_per_person, int min_per_item) {
    auto* L = new Loader();
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        L->error = std::string("cannot open ") + path;
        return L;
    }
    std::vector<char*> fields;
    char* buf = nullptr;
    size_t cap = 0;

    // header (getline: arbitrarily long lines stay one record)
    if (getline(&buf, &cap, f) < 0) {
        L->error = "empty file";
        std::free(buf);
        std::fclose(f);
        return L;
    }
    split_line_inplace(buf, fields);
    int pcol = -1, icol = -1, ccol = -1, dcol = -1;
    for (size_t i = 0; i < fields.size(); ++i) {
        if (!std::strcmp(fields[i], person_col)) pcol = static_cast<int>(i);
        if (!std::strcmp(fields[i], item_col)) icol = static_cast<int>(i);
        if (!std::strcmp(fields[i], correct_col)) ccol = static_cast<int>(i);
        if (denom_col && *denom_col && !std::strcmp(fields[i], denom_col))
            dcol = static_cast<int>(i);
    }
    if (pcol < 0 || icol < 0 || ccol < 0) {
        L->error = "missing column(s): expected " + std::string(person_col) +
                   "," + item_col + "," + correct_col;
        std::free(buf);
        std::fclose(f);
        return L;
    }
    if (mode == 1 && dcol < 0) {
        L->error = "missing column(s): expected denominator " +
                   std::string(denom_col ? denom_col : "");
        std::free(buf);
        std::fclose(f);
        return L;
    }
    const std::string match_lower = lower_trim(match ? match : "");

    // intern person/item ids -> uint32
    std::unordered_map<std::string, uint32_t> pid, iid;
    std::vector<std::string> pnames, inames;
    std::string scratch, match_scratch;
    // observed cells in file order; deduped keep-LAST after one sort.
    // Reserve from the file size (rows are >= ~12 bytes) so the vector
    // never regrows through GB-scale copies, and take huge-page faults on
    // the one up-front extent instead of 4k faults on every doubling.
    std::vector<Rec> recs;
#ifdef __linux__
    struct stat st;
    if (::stat(path, &st) == 0 && st.st_size > 0) {
        recs.reserve(static_cast<size_t>(st.st_size) / 12 + 1024);
        advise_hugepages(recs.data(), recs.capacity() * sizeof(Rec));
    }
#endif
    const int need = std::max({pcol, icol, ccol, dcol});

    while (getline(&buf, &cap, f) >= 0) {
        if (buf[0] == '\0' || buf[0] == '\n') continue;
        split_line_inplace(buf, fields);
        if (static_cast<int>(fields.size()) <= need) {
            L->parse_errors++;
            continue;
        }
        bool correct;
        if (mode == 3) {
            lower_trim_into(fields[ccol], match_scratch);
            correct = match_scratch == match_lower;
        } else {
            double c;
            if (!parse_number(fields[ccol], &c)) {
                L->parse_errors++;
                continue;
            }
            if (mode == 0) {
                correct = c > 0.5;
            } else {  // 1 or 2: compare against the denominator column
                double d = 1.0;
                if (dcol >= 0 && !parse_number(fields[dcol], &d)) {
                    L->parse_errors++;
                    continue;
                }
                correct = c >= d;
            }
        }
        uint32_t p = intern(pid, pnames, fields[pcol], scratch);
        uint32_t i = intern(iid, inames, fields[icol], scratch);
        recs.push_back({(static_cast<uint64_t>(p) << 32) | i,
                        static_cast<uint32_t>(recs.size()),
                        static_cast<int8_t>(correct ? 2 : 1)});
    }
    std::free(buf);
    std::fclose(f);

    // keep-LAST dedupe: sort by (pair, file order); a pair's last
    // occurrence is the final element of its run
    std::sort(recs.begin(), recs.end(), [](const Rec& a, const Rec& b) {
        return a.key != b.key ? a.key < b.key : a.seq < b.seq;
    });
    size_t out_n = 0;
    for (size_t r = 0; r < recs.size(); ++r) {
        if (r + 1 == recs.size() || recs[r + 1].key != recs[r].key)
            recs[out_n++] = recs[r];
    }
    recs.resize(out_n);

    // per-person / per-item observed counts on deduped pairs
    std::vector<uint32_t> pcount(pnames.size(), 0), icount(inames.size(), 0);
    for (const auto& rec : recs) {
        pcount[rec.key >> 32]++;
        icount[rec.key & 0xffffffffu]++;
    }
    // kept ids, sorted lexicographically (matches Python sorted())
    std::vector<uint32_t> keep_p, keep_i;
    for (uint32_t p = 0; p < pnames.size(); ++p)
        if (pcount[p] >= static_cast<uint32_t>(min_per_person)) keep_p.push_back(p);
    for (uint32_t i = 0; i < inames.size(); ++i)
        if (icount[i] >= static_cast<uint32_t>(min_per_item)) keep_i.push_back(i);
    std::sort(keep_p.begin(), keep_p.end(), [&](uint32_t a, uint32_t b) {
        return pnames[a] < pnames[b];
    });
    std::sort(keep_i.begin(), keep_i.end(), [&](uint32_t a, uint32_t b) {
        return inames[a] < inames[b];
    });
    std::vector<int32_t> prow(pnames.size(), -1), icolv(inames.size(), -1);
    for (size_t r = 0; r < keep_p.size(); ++r) {
        prow[keep_p[r]] = static_cast<int32_t>(r);
        L->persons.push_back(pnames[keep_p[r]]);
    }
    for (size_t c = 0; c < keep_i.size(); ++c) {
        icolv[keep_i[c]] = static_cast<int32_t>(c);
        L->items.push_back(inames[keep_i[c]]);
    }

    // Sparse output: at DuoLingo scale (13M observed cells in a 131k x 2k
    // matrix, ~5% density) materializing the dense matrix here AND decoding
    // it to f32 later cost two full-matrix passes — 2.1 GB of page-fault
    // writes each, measured ~17 s on this image's single virtualized core —
    // for ~95% zeros. The fill entry points scatter only the observed cells
    // into caller-ZEROED buffers instead (cells stay grouped per person —
    // recs is key-sorted — so each scatter row's pages are visited once).
    L->cells.reserve(recs.size());
    advise_hugepages(L->cells.data(), L->cells.capacity() * sizeof(Cell));
    for (const auto& rec : recs) {
        int32_t r = prow[rec.key >> 32];
        int32_t c = icolv[rec.key & 0xffffffffu];
        if (r >= 0 && c >= 0)
            L->cells.push_back({static_cast<uint32_t>(r),
                                static_cast<uint32_t>(c), rec.code});
    }
    return L;
}

void* rl_parse(const char* path, const char* person_col, const char* item_col,
               const char* correct_col, int min_per_person, int min_per_item) {
    return rl_parse_ex(path, person_col, item_col, correct_col, "", "", 0,
                       min_per_person, min_per_item);
}

int64_t rl_num_persons(void* h) { return static_cast<Loader*>(h)->persons.size(); }
int64_t rl_num_items(void* h) { return static_cast<Loader*>(h)->items.size(); }
int64_t rl_parse_errors(void* h) { return static_cast<Loader*>(h)->parse_errors; }

const char* rl_error(void* h) {
    auto* L = static_cast<Loader*>(h);
    return L->error.empty() ? nullptr : L->error.c_str();
}

// Scatter packed codes into a caller-ZEROED persons x items int8 buffer.
void rl_fill(void* h, int8_t* out) {
    auto* L = static_cast<Loader*>(h);
    const size_t m = L->items.size();
    for (const auto& c : L->cells)
        out[static_cast<size_t>(c.row) * m + c.col] = c.code;
}

// Decode straight into caller-ZEROED f32 response/mask buffers, touching
// only the observed cells. The round-2 version streamed a dense int8 matrix
// through a full-matrix decode loop; at 131k x 2048 (~5% density) that was
// 2.1 GB of stores for ~95% zeros — measured 17 s of the 34 s end-to-end
// parse on this image's single core. The numpy `(packed > 0).astype(f32)`
// route it replaced was worse still (~19 s in bool temporaries alone).
void rl_fill_f32(void* h, float* resp, float* mask) {
    auto* L = static_cast<Loader*>(h);
    const size_t m = L->items.size();
    for (const auto& c : L->cells) {
        const size_t k = static_cast<size_t>(c.row) * m + c.col;
        mask[k] = 1.0f;
        resp[k] = c.code == 2 ? 1.0f : 0.0f;
    }
}

const char* rl_person_ids(void* h) {
    auto* L = static_cast<Loader*>(h);
    L->person_blob.clear();
    for (const auto& s : L->persons) {
        L->person_blob += s;
        L->person_blob += '\n';
    }
    return L->person_blob.c_str();
}

const char* rl_item_ids(void* h) {
    auto* L = static_cast<Loader*>(h);
    L->item_blob.clear();
    for (const auto& s : L->items) {
        L->item_blob += s;
        L->item_blob += '\n';
    }
    return L->item_blob.c_str();
}

void rl_free(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
