// Native jsonl passage loader.
//
// Role: the data-loader hot path. The reference parses 33M-passage corpus files with
// python json.loads line-by-line (/root/reference/src/index_io.py:17-62) — minutes of
// startup per worker at Wiki scale. This loader streams the file, keeps only the
// fields the framework uses (id, title, section, text), applies the same mod-rank
// line sharding, and exposes one contiguous UTF-8 blob + offset table so Python can
// materialize passage dicts lazily (atlas_tpu/native/__init__.py NativePassageStore).
//
// JSON subset: flat objects with string / number / bool / null values and proper
// string escape handling (\" \\ \/ \b \f \n \r \t \uXXXX incl. surrogate pairs).
// Unknown keys are skipped. Lines without an "id" key abort with an error (the
// reference asserts the same, index_io.py:29).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Store {
  std::string blob;                  // concatenated field bytes
  std::vector<int64_t> offsets;      // 4 offsets per passage (id,title,text,end)
  std::string error;
};

// --- minimal JSON scanning helpers -----------------------------------------

inline void append_utf8(std::string* out, uint32_t cp) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

// parse a JSON string starting at s[i] == '"'; returns index after closing quote,
// or -1 on error. If out != nullptr, the unescaped bytes are appended.
int64_t parse_string(const char* s, int64_t i, int64_t n, std::string* out) {
  ++i;  // opening quote
  while (i < n) {
    unsigned char c = s[i];
    if (c == '"') return i + 1;
    if (c == '\\') {
      if (i + 1 >= n) return -1;
      char e = s[i + 1];
      i += 2;
      if (out == nullptr) {
        if (e == 'u') i += 4;
        continue;
      }
      switch (e) {
        case '"': out->push_back('"'); break;
        case '\\': out->push_back('\\'); break;
        case '/': out->push_back('/'); break;
        case 'b': out->push_back('\b'); break;
        case 'f': out->push_back('\f'); break;
        case 'n': out->push_back('\n'); break;
        case 'r': out->push_back('\r'); break;
        case 't': out->push_back('\t'); break;
        case 'u': {
          if (i + 4 > n) return -1;
          uint32_t cp = static_cast<uint32_t>(strtoul(std::string(s + i, 4).c_str(), nullptr, 16));
          i += 4;
          if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 <= n && s[i] == '\\' && s[i + 1] == 'u') {
            uint32_t lo = static_cast<uint32_t>(strtoul(std::string(s + i + 2, 4).c_str(), nullptr, 16));
            if (lo >= 0xDC00 && lo <= 0xDFFF) {
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
              i += 6;
            }
          }
          append_utf8(out, cp);
          break;
        }
        default: return -1;
      }
    } else {
      if (out) out->push_back(static_cast<char>(c));
      ++i;
    }
  }
  return -1;
}

// skip a JSON value (string / number / object / array / literal); returns index
// after the value or -1.
int64_t skip_value(const char* s, int64_t i, int64_t n) {
  while (i < n && (s[i] == ' ' || s[i] == '\t')) ++i;
  if (i >= n) return -1;
  char c = s[i];
  if (c == '"') return parse_string(s, i, n, nullptr);
  if (c == '{' || c == '[') {
    char open = c, close = (c == '{') ? '}' : ']';
    int depth = 0;
    while (i < n) {
      if (s[i] == '"') {
        i = parse_string(s, i, n, nullptr);
        if (i < 0) return -1;
        continue;
      }
      if (s[i] == open) ++depth;
      if (s[i] == close) {
        --depth;
        if (depth == 0) return i + 1;
      }
      ++i;
    }
    return -1;
  }
  // number / true / false / null: scan to delimiter
  while (i < n && s[i] != ',' && s[i] != '}' && s[i] != ']') ++i;
  return i;
}

// parse one line; appends id/title/text (with section merged into title like
// index_io.py:31-33) into the store. Returns false on parse error / missing id.
bool parse_line(const char* s, int64_t n, Store* st) {
  int64_t i = 0;
  while (i < n && s[i] != '{') ++i;
  if (i >= n) return false;
  ++i;
  std::string id, title, text, section;
  bool have_id = false, have_section = false;
  while (i < n) {
    while (i < n && (s[i] == ' ' || s[i] == ',' || s[i] == '\t')) ++i;
    if (i < n && s[i] == '}') break;
    if (i >= n || s[i] != '"') return false;
    std::string key;
    i = parse_string(s, i, n, &key);
    if (i < 0) return false;
    while (i < n && (s[i] == ' ' || s[i] == ':')) ++i;
    std::string* target = nullptr;
    if (key == "id") { target = &id; have_id = true; }
    else if (key == "title") target = &title;
    else if (key == "text") target = &text;
    else if (key == "section") { target = &section; }
    if (target != nullptr && i < n && s[i] == '"') {
      i = parse_string(s, i, n, target);
      if (i < 0) return false;
    } else if (target != nullptr) {
      // non-string value (e.g. numeric id): capture raw token
      int64_t j = skip_value(s, i, n);
      if (j < 0) return false;
      target->assign(s + i, static_cast<size_t>(j - i));
      i = j;
    } else {
      i = skip_value(s, i, n);
      if (i < 0) return false;
    }
    if (key == "section") have_section = !section.empty();
  }
  if (!have_id) return false;
  if (have_section) {  // index_io.py:31-33 title/section merge
    title += ": ";
    title += section;
  }
  int64_t base = static_cast<int64_t>(st->blob.size());
  st->offsets.push_back(base);
  st->blob += id;
  st->offsets.push_back(static_cast<int64_t>(st->blob.size()));
  st->blob += title;
  st->offsets.push_back(static_cast<int64_t>(st->blob.size()));
  st->blob += text;
  st->offsets.push_back(static_cast<int64_t>(st->blob.size()));
  return true;
}

}  // namespace

extern "C" {

void* atlas_load_jsonl(const char** paths, int n_paths, int64_t world_size,
                       int64_t rank, int64_t maxload, int64_t* out_n) {
  auto* st = new Store();
  st->blob.reserve(1 << 20);
  int64_t counter = 0;
  char* line = nullptr;
  size_t cap = 0;
  for (int p = 0; p < n_paths; ++p) {
    FILE* f = fopen(paths[p], "rb");
    if (f == nullptr) {
      st->error = std::string("cannot open ") + paths[p];
      *out_n = -1;
      free(line);
      return st;
    }
    ssize_t len;
    while ((len = getline(&line, &cap, f)) != -1) {
      if (maxload > -1 && counter >= maxload) break;
      bool mine = (counter % world_size) == rank;
      bool blank = true;
      for (ssize_t j = 0; j < len; ++j) {
        char c = line[j];
        if (c != ' ' && c != '\t' && c != '\r' && c != '\n') { blank = false; break; }
      }
      if (mine && !blank) {
        if (!parse_line(line, static_cast<int64_t>(len), st)) {
          st->error = "parse error (or missing id) at line " + std::to_string(counter) +
                      " of " + paths[p];
          fclose(f);
          *out_n = -1;
          free(line);
          return st;
        }
      }
      if (!blank) ++counter;
    }
    fclose(f);
    if (maxload > -1 && counter >= maxload) break;
  }
  free(line);
  *out_n = static_cast<int64_t>(st->offsets.size() / 4);
  return st;
}

const char* atlas_blob(void* handle, int64_t* size) {
  auto* st = static_cast<Store*>(handle);
  *size = static_cast<int64_t>(st->blob.size());
  return st->blob.data();
}

const int64_t* atlas_offsets(void* handle, int64_t* count) {
  auto* st = static_cast<Store*>(handle);
  *count = static_cast<int64_t>(st->offsets.size());
  return st->offsets.data();
}

const char* atlas_error(void* handle) {
  return static_cast<Store*>(handle)->error.c_str();
}

void atlas_free(void* handle) { delete static_cast<Store*>(handle); }

}  // extern "C"
