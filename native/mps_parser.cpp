// Fast MPS tokenizer/loader — native component of the I/O path.
//
// The reference is 100% native (Rust); in this build the compute path's native
// analog is compiled XLA/Pallas (see PARITY.md), and the host-side runtime
// components get real native implementations where they are hot.  Parsing
// large Netlib/Mittelmann MPS files is the hot host path (millions of tokens;
// pure-Python parsing is ~30-50x slower), so the section scanner and COLUMNS
// triplet extraction are done here and returned to Python as flat arrays.
//
// Interface (C ABI, consumed via ctypes from minilp_tpu/io/mps_native.py):
//   mps_parse(text, len) -> opaque handle (thread-local result)
//   accessor functions copy out flat arrays (row metadata, triplets, rhs,
//   ranges, bounds) using caller-provided buffers.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Bound {
  int32_t col;
  int32_t type;  // 0 UP, 1 LO, 2 FX, 3 FR, 4 MI, 5 PL, 6 BV, 7 UI, 8 LI
  double value;
};

struct ParseResult {
  std::string name;
  std::string error;
  // rows: sense per row (0 L, 1 G, 2 E); objective row handled separately
  std::vector<int32_t> row_sense;
  std::vector<std::string> row_names;
  std::vector<std::string> col_names;
  // COLUMNS triplets: (col, row, coeff); obj coefficients as row = -1
  std::vector<int32_t> tri_col;
  std::vector<int32_t> tri_row;
  std::vector<double> tri_val;
  // RHS entries: (row, value); objective constant as row = -1 (negated value)
  std::vector<int32_t> rhs_row;
  std::vector<double> rhs_val;
  std::vector<int32_t> range_row;
  std::vector<double> range_val;
  std::vector<Bound> bounds;
  std::vector<int32_t> integer_cols;  // col ids marked INTORG..INTEND or BV/UI/LI
};

thread_local ParseResult g_result;

struct Tokenizer {
  const char* p;
  const char* end;
  bool at_line_start = true;

  explicit Tokenizer(const char* text, size_t len) : p(text), end(text + len) {}

  // Returns next token on the current line, empty if line exhausted.
  std::string next_on_line() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    if (p >= end || *p == '\n') return {};
    const char* start = p;
    while (p < end && !std::isspace(static_cast<unsigned char>(*p))) ++p;
    return std::string(start, p - start);
  }

  // Advance to the start of the next non-empty, non-comment line.
  // Returns false at EOF.  Sets indented=true if the line starts with space.
  bool next_line(bool* indented) {
    // skip remainder of current line
    while (p < end && *p != '\n') ++p;
    while (p < end) {
      ++p;  // skip '\n'
      if (p >= end) return false;
      if (*p == '*') {  // comment
        while (p < end && *p != '\n') ++p;
        continue;
      }
      const char* q = p;
      bool ind = (*q == ' ' || *q == '\t');
      while (q < end && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
      if (q >= end) return false;
      if (*q == '\n') { p = q; continue; }  // blank line
      *indented = ind;
      return true;
    }
    return false;
  }
};

int32_t bound_type_code(const std::string& t) {
  if (t == "UP") return 0;
  if (t == "LO") return 1;
  if (t == "FX") return 2;
  if (t == "FR") return 3;
  if (t == "MI") return 4;
  if (t == "PL") return 5;
  if (t == "BV") return 6;
  if (t == "UI") return 7;
  if (t == "LI") return 8;
  return -1;
}

std::string upper(std::string s) {
  for (auto& ch : s) ch = std::toupper(static_cast<unsigned char>(ch));
  return s;
}

}  // namespace

extern "C" {

// Parse; returns 0 on success, nonzero on error (message via mps_error()).
int mps_parse(const char* text, int64_t len) {
  ParseResult& R = g_result;
  R = ParseResult();

  std::unordered_map<std::string, int32_t> row_ids;
  std::unordered_map<std::string, int32_t> col_ids;
  std::string obj_row;

  enum Section { NONE, SNAME, ROWS, COLUMNS, RHS, RANGES, BOUNDS, OBJSENSE, DONE };
  Section section = NONE;
  bool in_integer = false;

  Tokenizer tk(text, static_cast<size_t>(len));
  // position at first line (handle leading comments/blank by faking a \n-scan)
  // Simplest: treat buffer start as a line start.
  bool indented = (len > 0 && (text[0] == ' ' || text[0] == '\t'));
  bool have_line = len > 0;
  if (have_line && text[0] == '*') {
    have_line = tk.next_line(&indented);
  }

  auto get_col = [&](const std::string& name) -> int32_t {
    auto it = col_ids.find(name);
    if (it != col_ids.end()) return it->second;
    int32_t id = static_cast<int32_t>(R.col_names.size());
    col_ids.emplace(name, id);
    R.col_names.push_back(name);
    if (in_integer) R.integer_cols.push_back(id);
    return id;
  };

  while (have_line) {
    if (!indented) {
      std::string head = upper(tk.next_on_line());
      if (head == "NAME") {
        R.name = tk.next_on_line();
        section = SNAME;
      } else if (head == "ROWS") {
        section = ROWS;
      } else if (head == "COLUMNS") {
        section = COLUMNS;
      } else if (head == "RHS") {
        section = RHS;
      } else if (head == "RANGES") {
        section = RANGES;
      } else if (head == "BOUNDS") {
        section = BOUNDS;
      } else if (head == "OBJSENSE") {
        section = OBJSENSE;
      } else if (head == "ENDATA") {
        section = DONE;
        break;
      } else {
        section = NONE;  // unknown section: skip its lines
      }
      have_line = tk.next_line(&indented);
      continue;
    }

    switch (section) {
      case ROWS: {
        std::string sense = upper(tk.next_on_line());
        std::string rname = tk.next_on_line();
        if (sense == "N") {
          if (obj_row.empty()) obj_row = rname;
        } else if (sense == "L" || sense == "G" || sense == "E") {
          int32_t code = sense == "L" ? 0 : sense == "G" ? 1 : 2;
          row_ids.emplace(rname, static_cast<int32_t>(R.row_names.size()));
          R.row_names.push_back(rname);
          R.row_sense.push_back(code);
        } else {
          R.error = "bad row sense: " + sense;
          return 1;
        }
        break;
      }
      case COLUMNS: {
        std::string cname = tk.next_on_line();
        std::string f1 = tk.next_on_line();
        if (upper(f1) == "'MARKER'") {
          std::string marker = upper(tk.next_on_line());
          if (marker.find("INTORG") != std::string::npos) in_integer = true;
          else if (marker.find("INTEND") != std::string::npos) in_integer = false;
          break;
        }
        // possible "<name> MARKER 'INTORG'" layout
        if (upper(cname) == "MARKER") {
          std::string rest = upper(f1 + tk.next_on_line());
          if (rest.find("INTORG") != std::string::npos) in_integer = true;
          else if (rest.find("INTEND") != std::string::npos) in_integer = false;
          break;
        }
        int32_t col = get_col(cname);
        std::string rname = f1;
        while (!rname.empty()) {
          std::string val = tk.next_on_line();
          if (val.empty()) { R.error = "odd COLUMNS pair"; return 1; }
          double v = std::strtod(val.c_str(), nullptr);
          if (rname == obj_row) {
            R.tri_col.push_back(col);
            R.tri_row.push_back(-1);
            R.tri_val.push_back(v);
          } else {
            auto it = row_ids.find(rname);
            if (it != row_ids.end()) {
              R.tri_col.push_back(col);
              R.tri_row.push_back(it->second);
              R.tri_val.push_back(v);
            }
            // entries on free/unknown rows are ignored
          }
          rname = tk.next_on_line();
        }
        break;
      }
      case RHS: {
        std::string first = tk.next_on_line();
        std::string rname;
        // RHS set name is optional in sloppy files: detect by row lookup
        if (row_ids.count(first) || first == obj_row) {
          rname = first;
        } else {
          rname = tk.next_on_line();
        }
        while (!rname.empty()) {
          std::string val = tk.next_on_line();
          if (val.empty()) { R.error = "odd RHS pair"; return 1; }
          double v = std::strtod(val.c_str(), nullptr);
          if (rname == obj_row) {
            R.rhs_row.push_back(-1);
            R.rhs_val.push_back(v);
          } else {
            auto it = row_ids.find(rname);
            if (it != row_ids.end()) {
              R.rhs_row.push_back(it->second);
              R.rhs_val.push_back(v);
            }
          }
          rname = tk.next_on_line();
        }
        break;
      }
      case RANGES: {
        std::string first = tk.next_on_line();
        std::string rname = row_ids.count(first) ? first : tk.next_on_line();
        while (!rname.empty()) {
          std::string val = tk.next_on_line();
          if (val.empty()) { R.error = "odd RANGES pair"; return 1; }
          auto it = row_ids.find(rname);
          if (it != row_ids.end()) {
            R.range_row.push_back(it->second);
            R.range_val.push_back(std::strtod(val.c_str(), nullptr));
          }
          rname = tk.next_on_line();
        }
        break;
      }
      case BOUNDS: {
        std::string btype = upper(tk.next_on_line());
        int32_t code = bound_type_code(btype);
        if (code < 0) { R.error = "bad bound type: " + btype; return 1; }
        std::string a = tk.next_on_line();  // set name (usually)
        std::string b = tk.next_on_line();  // col name (usually)
        std::string cname;
        std::string valtok;
        if (col_ids.count(b) || (!b.empty() && !col_ids.count(a))) {
          cname = b;
          valtok = tk.next_on_line();
        } else {  // sloppy: set name omitted
          cname = a;
          valtok = b;
        }
        auto it = col_ids.find(cname);
        if (it != col_ids.end()) {
          double v = valtok.empty() ? 0.0 : std::strtod(valtok.c_str(), nullptr);
          R.bounds.push_back(Bound{it->second, code, v});
          if ((code == 6 || code == 7 || code == 8)) R.integer_cols.push_back(it->second);
        }
        break;
      }
      case OBJSENSE:
      case SNAME:
      case NONE:
      case RHS + 100:  // silence warnings
      default:
        break;
    }
    have_line = tk.next_line(&indented);
  }

  if (obj_row.empty()) {
    R.error = "no objective (N) row";
    return 1;
  }
  return 0;
}

const char* mps_error() { return g_result.error.c_str(); }
const char* mps_name() { return g_result.name.c_str(); }

int64_t mps_num_rows() { return static_cast<int64_t>(g_result.row_sense.size()); }
int64_t mps_num_cols() { return static_cast<int64_t>(g_result.col_names.size()); }
int64_t mps_num_triplets() { return static_cast<int64_t>(g_result.tri_val.size()); }
int64_t mps_num_rhs() { return static_cast<int64_t>(g_result.rhs_val.size()); }
int64_t mps_num_ranges() { return static_cast<int64_t>(g_result.range_val.size()); }
int64_t mps_num_bounds() { return static_cast<int64_t>(g_result.bounds.size()); }
int64_t mps_num_integer() { return static_cast<int64_t>(g_result.integer_cols.size()); }

void mps_copy_row_sense(int32_t* out) {
  std::memcpy(out, g_result.row_sense.data(),
              g_result.row_sense.size() * sizeof(int32_t));
}
void mps_copy_triplets(int32_t* cols, int32_t* rows, double* vals) {
  std::memcpy(cols, g_result.tri_col.data(), g_result.tri_col.size() * 4);
  std::memcpy(rows, g_result.tri_row.data(), g_result.tri_row.size() * 4);
  std::memcpy(vals, g_result.tri_val.data(), g_result.tri_val.size() * 8);
}
void mps_copy_rhs(int32_t* rows, double* vals) {
  std::memcpy(rows, g_result.rhs_row.data(), g_result.rhs_row.size() * 4);
  std::memcpy(vals, g_result.rhs_val.data(), g_result.rhs_val.size() * 8);
}
void mps_copy_ranges(int32_t* rows, double* vals) {
  std::memcpy(rows, g_result.range_row.data(), g_result.range_row.size() * 4);
  std::memcpy(vals, g_result.range_val.data(), g_result.range_val.size() * 8);
}
void mps_copy_bounds(int32_t* cols, int32_t* types, double* vals) {
  for (size_t i = 0; i < g_result.bounds.size(); ++i) {
    cols[i] = g_result.bounds[i].col;
    types[i] = g_result.bounds[i].type;
    vals[i] = g_result.bounds[i].value;
  }
}
void mps_copy_integer(int32_t* out) {
  std::memcpy(out, g_result.integer_cols.data(),
              g_result.integer_cols.size() * 4);
}
// Names are returned as one \n-joined buffer; caller asks for size first.
int64_t mps_row_names_size() {
  int64_t total = 0;
  for (auto& s : g_result.row_names) total += static_cast<int64_t>(s.size()) + 1;
  return total;
}
void mps_copy_row_names(char* out) {
  for (auto& s : g_result.row_names) {
    std::memcpy(out, s.data(), s.size());
    out += s.size();
    *out++ = '\n';
  }
}
int64_t mps_col_names_size() {
  int64_t total = 0;
  for (auto& s : g_result.col_names) total += static_cast<int64_t>(s.size()) + 1;
  return total;
}
void mps_copy_col_names(char* out) {
  for (auto& s : g_result.col_names) {
    std::memcpy(out, s.data(), s.size());
    out += s.size();
    *out++ = '\n';
  }
}

}  // extern "C"
