// Native atomic-file reader: multithreaded TSV parser for the framework's
// data contract (parity: the reference loads atomic files through
// pandas.read_csv, recbole/data/dataset.py:369-408 — its only "native" IO is
// pandas' C engine; this is the TPU build's counterpart, shaped for the
// columnar-numpy pipeline instead of DataFrames).
//
// Scope: scalar columns only — float ('f') and token ('t'). Files carrying
// *_seq columns take the pandas fallback in Python (they are the small side
// tables; .inter/.kg — the multi-million-row files — are scalar).
//
// Token columns are FACTORIZED here: Python receives int64 codes plus a
// unique-string arena, and rebuilds the object column with one fancy-index
// (pointer copies, no per-row string construction). Empty cells and pandas'
// default NA sentinels map to code -1 / NaN, matching read_csv defaults.
//
// ABI (ctypes): see atr_* functions at the bottom. One handle per file;
// all parsing happens in atr_open (worker threads split the row range).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

const char* kNaSentinels[] = {
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null"};

bool is_na(std::string_view s) {
  for (const char* na : kNaSentinels)
    if (s == na) return true;
  return false;
}

struct TokenCol {
  std::vector<int64_t> codes;              // -1 = NA
  std::vector<std::string> uniq;           // first-occurrence order
  int64_t arena_bytes = 0;
};

struct Handle {
  std::string error;
  int64_t n_rows = 0;
  std::vector<char> kinds;                 // per selected column: 'f' | 't'
  std::vector<std::vector<float>> fcols;   // per selected col (empty if 't')
  std::vector<TokenCol> tcols;             // per selected col (empty if 'f')
};

// Find cell [begin,end) boundaries for selected columns of one line.
// Returns false on a short row (missing cells become NA like pandas).
inline void split_selected(const char* p, const char* line_end, char sep,
                           const int* sel, int n_sel,
                           std::string_view* out) {
  int col = 0, want = 0;
  const char* cell = p;
  for (int i = 0; i < n_sel; ++i) out[i] = std::string_view();
  while (want < n_sel) {
    const char* q = cell;
    while (q < line_end && *q != sep) ++q;
    if (col == sel[want]) {
      const char* e = q;
      if (e > cell && e[-1] == '\r') --e;  // CRLF
      out[want++] = std::string_view(cell, size_t(e - cell));
    }
    ++col;
    if (q >= line_end) break;
    cell = q + 1;
  }
}

inline float parse_float(std::string_view s) {
  if (s.empty() || is_na(s)) return NAN;
  char buf[64];
  size_t n = s.size() < 63 ? s.size() : 63;
  memcpy(buf, s.data(), n);
  buf[n] = 0;
  char* end = nullptr;
  double v = strtod(buf, &end);
  if (end == buf || *end != 0) return NAN;  // pd.to_numeric errors="coerce"
  return float(v);
}

}  // namespace

extern "C" {

Handle* atr_open(const char* path, char sep, int n_sel, const int* sel_idx,
                 const char* kinds, int n_threads) {
  auto* h = new Handle();
  h->kinds.assign(kinds, kinds + n_sel);

  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) { h->error = "cannot open file"; return h; }
  int64_t size = f.tellg();
  f.seekg(0);
  std::vector<char> data(static_cast<size_t>(size));
  f.read(data.data(), size);
  if (!f.good() && size > 0) { h->error = "short read"; return h; }

  // bail (Python falls back to pandas) on quoted fields — read_csv would
  // apply csv quoting rules we do not replicate
  if (memchr(data.data(), '"', size_t(size)) != nullptr) {
    h->error = "quoted field";
    return h;
  }

  // line starts, skipping the header and blank lines (pandas default)
  std::vector<const char*> starts;
  std::vector<const char*> ends;
  const char* p = data.data();
  const char* eof = data.data() + size;
  // skip header line
  while (p < eof && *p != '\n') ++p;
  if (p < eof) ++p;
  while (p < eof) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', size_t(eof - p)));
    const char* line_end = nl ? nl : eof;
    // pandas skip_blank_lines drops only truly empty lines; a line of
    // separators ("\t\t") still parses as a row of NA cells — match that
    bool blank = true;
    for (const char* q = p; q < line_end; ++q)
      if (*q != '\r') { blank = false; break; }
    if (!blank) { starts.push_back(p); ends.push_back(line_end); }
    p = nl ? nl + 1 : eof;
  }
  int64_t n = int64_t(starts.size());
  h->n_rows = n;

  h->fcols.resize(size_t(n_sel));
  h->tcols.resize(size_t(n_sel));
  // token cells collected as string_views first, factorized after the join
  std::vector<std::vector<std::string_view>> tviews(static_cast<size_t>(n_sel));
  for (int c = 0; c < n_sel; ++c) {
    if (h->kinds[size_t(c)] == 'f') h->fcols[size_t(c)].resize(size_t(n));
    else tviews[size_t(c)].resize(size_t(n));
  }

  int workers = n_threads > 0 ? n_threads : 1;
  if (workers > 16) workers = 16;
  std::vector<std::thread> pool;
  std::atomic<bool> bad_row{false};
  int64_t chunk = (n + workers - 1) / workers;
  for (int w = 0; w < workers; ++w) {
    int64_t lo = w * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([&, lo, hi]() {
      std::vector<std::string_view> cells(static_cast<size_t>(n_sel));
      for (int64_t r = lo; r < hi; ++r) {
        split_selected(starts[size_t(r)], ends[size_t(r)], sep,
                       sel_idx, n_sel, cells.data());
        for (int c = 0; c < n_sel; ++c) {
          if (h->kinds[size_t(c)] == 'f')
            h->fcols[size_t(c)][size_t(r)] = parse_float(cells[size_t(c)]);
          else
            tviews[size_t(c)][size_t(r)] = cells[size_t(c)];
        }
      }
    });
  }
  for (auto& t : pool) t.join();
  (void)bad_row;

  // factorize token columns (hash per column, columns in parallel)
  std::vector<std::thread> fpool;
  for (int c = 0; c < n_sel; ++c) {
    if (h->kinds[size_t(c)] != 't') continue;
    fpool.emplace_back([&, c]() {
      TokenCol& tc = h->tcols[size_t(c)];
      tc.codes.resize(size_t(n));
      std::unordered_map<std::string_view, int64_t> map;
      map.reserve(size_t(n) / 4 + 16);
      for (int64_t r = 0; r < n; ++r) {
        std::string_view s = tviews[size_t(c)][size_t(r)];
        if (is_na(s)) { tc.codes[size_t(r)] = -1; continue; }
        auto it = map.find(s);
        if (it == map.end()) {
          int64_t id = int64_t(tc.uniq.size());
          tc.uniq.emplace_back(s);
          tc.arena_bytes += int64_t(s.size());
          // the key view points into the file buffer `data`, which outlives
          // this loop (tc.uniq strings would move on vector reallocation)
          map.emplace(s, id);
          tc.codes[size_t(r)] = id;
        } else {
          tc.codes[size_t(r)] = it->second;
        }
      }
    });
  }
  for (auto& t : fpool) t.join();
  return h;
}

const char* atr_error(Handle* h) { return h->error.c_str(); }
int64_t atr_rows(Handle* h) { return h->n_rows; }

void atr_float(Handle* h, int sel_pos, float* out) {
  const auto& v = h->fcols[size_t(sel_pos)];
  memcpy(out, v.data(), v.size() * sizeof(float));
}

int64_t atr_token_n_uniq(Handle* h, int sel_pos) {
  return int64_t(h->tcols[size_t(sel_pos)].uniq.size());
}

int64_t atr_token_arena_bytes(Handle* h, int sel_pos) {
  return h->tcols[size_t(sel_pos)].arena_bytes;
}

void atr_token_codes(Handle* h, int sel_pos, int64_t* out) {
  const auto& v = h->tcols[size_t(sel_pos)].codes;
  memcpy(out, v.data(), v.size() * sizeof(int64_t));
}

void atr_token_uniq(Handle* h, int sel_pos, char* arena, int64_t* offsets) {
  const auto& tc = h->tcols[size_t(sel_pos)];
  int64_t off = 0;
  for (size_t i = 0; i < tc.uniq.size(); ++i) {
    offsets[i] = off;
    memcpy(arena + off, tc.uniq[i].data(), tc.uniq[i].size());
    off += int64_t(tc.uniq[i].size());
  }
  offsets[tc.uniq.size()] = off;
}

void atr_close(Handle* h) { delete h; }

}  // extern "C"
