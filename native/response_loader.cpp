// Native response-matrix builder: long-format CSV -> dense packed int8 codes.
//
// The framework's data-loading hot path (SURVEY.md section 3.3 "Real-dataset
// loaders"): DuoLingo-scale dumps are ~13M rows; the pure-Python csv module
// takes minutes there. This parser does the same reduction as
// vibo_tpu.data.loaders.long_to_matrix — dedupe (person,item) keeping the
// last response, filter persons/items with fewer than min observed responses,
// sort ids lexicographically, emit packed codes (0=missing, 1=incorrect,
// 2=correct) ready for vibo_tpu.ops.pallas_elbo.pack_responses consumers —
// at ~100x the throughput.
//
// C ABI (handle-based), consumed via ctypes from vibo_tpu/data/native.py:
//   rl_parse(path, person_col, item_col, correct_col, min_p, min_i) -> handle
//   rl_num_persons/rl_num_items(handle)
//   rl_fill(handle, int8* out)           // row-major persons x items
//   rl_person_ids/rl_item_ids(handle)    // newline-joined sorted ids
//   rl_error(handle) / rl_free(handle)
//
// Semantics are byte-identical to the Python implementation (asserted in
// tests/test_native.py). Python remains the fallback when the .so is absent.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<uint32_t, uint32_t>& p) const {
        return (static_cast<size_t>(p.first) << 32) ^ p.second;
    }
};

struct Loader {
    std::vector<std::string> persons;  // sorted kept person ids
    std::vector<std::string> items;    // sorted kept item ids
    std::vector<int8_t> matrix;        // persons x items packed codes
    std::string error;
    std::string person_blob, item_blob;
};

// Split one CSV line into fields (no quoted-comma support: the response
// dumps we target are plain). Returns false if fewer than `need` fields.
bool split_line(const std::string& line, std::vector<std::string>& out) {
    out.clear();
    size_t start = 0;
    while (true) {
        size_t pos = line.find(',', start);
        if (pos == std::string::npos) {
            std::string last = line.substr(start);
            while (!last.empty() && (last.back() == '\r' || last.back() == '\n'))
                last.pop_back();
            out.push_back(std::move(last));
            break;
        }
        out.push_back(line.substr(start, pos - start));
        start = pos + 1;
    }
    return true;
}

}  // namespace

extern "C" {

void* rl_parse(const char* path, const char* person_col, const char* item_col,
               const char* correct_col, int min_per_person, int min_per_item) {
    auto* L = new Loader();
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        L->error = std::string("cannot open ") + path;
        return L;
    }
    // Read whole file (response dumps are at most a few GB; stream lines).
    std::string line;
    std::vector<std::string> fields;
    char buf[1 << 16];

    // header
    if (!std::fgets(buf, sizeof buf, f)) {
        L->error = "empty file";
        std::fclose(f);
        return L;
    }
    line = buf;
    split_line(line, fields);
    int pcol = -1, icol = -1, ccol = -1;
    for (size_t i = 0; i < fields.size(); ++i) {
        if (fields[i] == person_col) pcol = static_cast<int>(i);
        if (fields[i] == item_col) icol = static_cast<int>(i);
        if (fields[i] == correct_col) ccol = static_cast<int>(i);
    }
    if (pcol < 0 || icol < 0 || ccol < 0) {
        L->error = "missing column(s): expected " + std::string(person_col) +
                   "," + item_col + "," + correct_col;
        std::fclose(f);
        return L;
    }

    // intern person/item ids -> uint32
    std::unordered_map<std::string, uint32_t> pid, iid;
    std::vector<std::string> pnames, inames;
    // dedupe pairs, keep LAST response
    std::unordered_map<std::pair<uint32_t, uint32_t>, int8_t, PairHash> cells;
    cells.reserve(1 << 20);

    while (std::fgets(buf, sizeof buf, f)) {
        line = buf;
        if (line.empty() || line == "\n") continue;
        split_line(line, fields);
        size_t need = static_cast<size_t>(std::max({pcol, icol, ccol}));
        if (fields.size() <= need) continue;
        auto intern = [](std::unordered_map<std::string, uint32_t>& map,
                         std::vector<std::string>& names,
                         const std::string& key) {
            auto it = map.find(key);
            if (it != map.end()) return it->second;
            uint32_t id = static_cast<uint32_t>(names.size());
            map.emplace(key, id);
            names.push_back(key);
            return id;
        };
        uint32_t p = intern(pid, pnames, fields[pcol]);
        uint32_t i = intern(iid, inames, fields[icol]);
        double c = std::atof(fields[ccol].c_str());
        cells[{p, i}] = c > 0.5 ? 2 : 1;  // packed code
    }
    std::fclose(f);

    // per-person / per-item observed counts on deduped pairs
    std::vector<uint32_t> pcount(pnames.size(), 0), icount(inames.size(), 0);
    for (const auto& kv : cells) {
        pcount[kv.first.first]++;
        icount[kv.first.second]++;
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

    const size_t n = L->persons.size(), m = L->items.size();
    L->matrix.assign(n * m, 0);
    for (const auto& kv : cells) {
        int32_t r = prow[kv.first.first];
        int32_t c = icolv[kv.first.second];
        if (r >= 0 && c >= 0) L->matrix[static_cast<size_t>(r) * m + c] = kv.second;
    }
    return L;
}

int64_t rl_num_persons(void* h) { return static_cast<Loader*>(h)->persons.size(); }
int64_t rl_num_items(void* h) { return static_cast<Loader*>(h)->items.size(); }

const char* rl_error(void* h) {
    auto* L = static_cast<Loader*>(h);
    return L->error.empty() ? nullptr : L->error.c_str();
}

void rl_fill(void* h, int8_t* out) {
    auto* L = static_cast<Loader*>(h);
    std::memcpy(out, L->matrix.data(), L->matrix.size());
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
