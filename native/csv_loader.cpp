// Native CSV loader — the framework's data-ingest runtime.
//
// TPU-native equivalent of the reference's CSV.read path
// (examples/eeg.jl:8-9): a multi-threaded CSV parser producing a contiguous
// row-major double buffer ready to wrap as a numpy array (zero-copy via
// ctypes) and feed to jnp.  Parsing is chunked across std::thread workers:
// the file is memory-loaded once, split at line boundaries, and each worker
// parses its span with strtod into its slice of the output.
//
// C API (ctypes-friendly):
//   csv_open(path)            -> handle (NULL on failure; csv_last_error())
//   csv_rows/csv_cols(handle) -> dimensions
//   csv_colname(handle, j)    -> header name
//   csv_data(handle)          -> const double* (row-major, rows x cols)
//   csv_close(handle)
//
// Build: make -C native   (produces libgpar_io.so)

#include <atomic>
#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct CsvTable {
  std::vector<std::string> names;
  std::vector<double> data;  // row-major
  long rows = 0;
  long cols = 0;
};

std::mutex g_err_mutex;
std::string g_last_error;

void set_error(const std::string& msg) {
  std::lock_guard<std::mutex> lock(g_err_mutex);
  g_last_error = msg;
}

// Split [begin, end) into per-thread spans aligned to line starts.
std::vector<const char*> chunk_starts(const char* begin, const char* end, int n) {
  std::vector<const char*> starts{begin};
  const size_t total = static_cast<size_t>(end - begin);
  for (int i = 1; i < n; ++i) {
    const char* p = begin + total * i / n;
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;  // first char after the newline
    starts.push_back(p);
  }
  starts.push_back(end);
  return starts;
}

long count_lines(const char* begin, const char* end) {
  long n = 0;
  for (const char* p = begin; p < end; ++p)
    if (*p == '\n') ++n;
  if (end > begin && end[-1] != '\n') ++n;  // unterminated last line
  return n;
}

}  // namespace

extern "C" {

const char* csv_last_error() { return g_last_error.c_str(); }

void* csv_open(const char* path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    set_error(std::string("cannot open ") + path);
    return nullptr;
  }
  const auto size = static_cast<size_t>(f.tellg());
  f.seekg(0);
  std::vector<char> buf(size + 1);
  if (!f.read(buf.data(), size)) {
    set_error(std::string("cannot read ") + path);
    return nullptr;
  }
  buf[size] = '\0';
  const char* begin = buf.data();
  const char* end = begin + size;

  auto table = std::make_unique<CsvTable>();

  // Header.
  const char* p = begin;
  const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
  if (line_end == nullptr) line_end = end;
  {
    std::string header(p, line_end);
    size_t start = 0;
    while (start <= header.size()) {
      size_t comma = header.find(',', start);
      if (comma == std::string::npos) comma = header.size();
      std::string name = header.substr(start, comma - start);
      // trim whitespace and quotes
      while (!name.empty() && (isspace(static_cast<unsigned char>(name.front())) || name.front() == '"'))
        name.erase(name.begin());
      while (!name.empty() && (isspace(static_cast<unsigned char>(name.back())) || name.back() == '"' || name.back() == '\r'))
        name.pop_back();
      table->names.push_back(name);
      if (comma == header.size()) break;
      start = comma + 1;
    }
  }
  table->cols = static_cast<long>(table->names.size());
  if (table->cols == 0) {
    set_error("empty header");
    return nullptr;
  }
  const char* body = (line_end < end) ? line_end + 1 : end;
  table->rows = count_lines(body, end);
  table->data.assign(static_cast<size_t>(table->rows) * table->cols, 0.0);

  const int hw = static_cast<int>(std::thread::hardware_concurrency());
  const int num_threads = std::max(1, std::min(hw, static_cast<int>(table->rows / 4096) + 1));
  auto spans = chunk_starts(body, end, num_threads);

  // Each worker needs its starting row index: count rows per span first.
  std::vector<long> span_rows(num_threads);
  for (int i = 0; i < num_threads; ++i)
    span_rows[i] = count_lines(spans[i], spans[i + 1]);
  std::vector<long> row_offset(num_threads, 0);
  for (int i = 1; i < num_threads; ++i)
    row_offset[i] = row_offset[i - 1] + span_rows[i - 1];

  std::atomic<bool> ok{true};
  auto worker = [&](int wi) {
    const char* q = spans[wi];
    const char* qe = spans[wi + 1];
    long row = row_offset[wi];
    const long cols = table->cols;
    while (q < qe && ok.load(std::memory_order_relaxed)) {
      double* out = table->data.data() + static_cast<size_t>(row) * cols;
      for (long c = 0; c < cols; ++c) {
        char* next = nullptr;
        out[c] = strtod(q, &next);
        if (next == q) {  // empty / non-numeric cell -> NaN
          out[c] = std::strtod("nan", nullptr);
          while (q < qe && *q != ',' && *q != '\n') ++q;
        } else {
          q = next;
        }
        if (q < qe && *q == ',') ++q;
      }
      while (q < qe && *q != '\n') ++q;
      if (q < qe) ++q;
      ++row;
    }
  };

  std::vector<std::thread> threads;
  for (int i = 0; i < num_threads; ++i) threads.emplace_back(worker, i);
  for (auto& th : threads) th.join();

  if (!ok) {
    set_error("parse failure");
    return nullptr;
  }
  return table.release();
}

long csv_rows(void* h) { return static_cast<CsvTable*>(h)->rows; }
long csv_cols(void* h) { return static_cast<CsvTable*>(h)->cols; }

const char* csv_colname(void* h, long j) {
  auto* t = static_cast<CsvTable*>(h);
  if (j < 0 || j >= t->cols) return "";
  return t->names[static_cast<size_t>(j)].c_str();
}

const double* csv_data(void* h) { return static_cast<CsvTable*>(h)->data.data(); }

void csv_close(void* h) { delete static_cast<CsvTable*>(h); }

}  // extern "C"
