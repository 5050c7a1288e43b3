// Native featurizer for the hash embedder's host-side hot loop.
//
// The ingest pipeline spends its host CPU in tokenize -> n-gram count ->
// feature-hash per chunk (the TPU does the projection). This library
// reproduces semcode_tpu/embeddings/hash_embedder.py's featurization
// byte-for-byte (same tokens, same ordering, same crc32 buckets/signs, same
// weights) at C++ speed, and is loaded via ctypes with the Python
// implementation as fallback. Build: make -C native (g++ -O3 -shared, links
// zlib for crc32).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kMaxToks = 2048;

inline bool is_ident_start(unsigned char c) {
  return std::isalpha(c) || c == '_';
}
inline bool is_ident(unsigned char c) { return std::isalnum(c) || c == '_'; }

// re.findall(r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z]+|[A-Z]+|\d+", tok)
void camel_split(const std::string& tok, std::vector<std::string>* out) {
  size_t i = 0, n = tok.size();
  while (i < n) {
    unsigned char c = tok[i];
    if (std::isupper(c)) {
      // alternative 1: [A-Z]+ followed by [A-Z][a-z] lookahead
      size_t j = i;
      while (j < n && std::isupper((unsigned char)tok[j])) j++;
      size_t run = j - i;
      if (run >= 2 && j < n && std::islower((unsigned char)tok[j])) {
        // last upper belongs to the next word: emit [i, j-1)
        out->emplace_back(tok.substr(i, run - 1));
        i = j - 1;
        continue;
      }
      // alternative 2: [A-Z]?[a-z]+
      if (i + 1 < n && std::islower((unsigned char)tok[i + 1])) {
        size_t k = i + 1;
        while (k < n && std::islower((unsigned char)tok[k])) k++;
        out->emplace_back(tok.substr(i, k - i));
        i = k;
        continue;
      }
      // alternative 3: [A-Z]+
      out->emplace_back(tok.substr(i, run));
      i = j;
    } else if (std::islower(c)) {
      size_t k = i;
      while (k < n && std::islower((unsigned char)tok[k])) k++;
      out->emplace_back(tok.substr(i, k - i));
      i = k;
    } else if (std::isdigit(c)) {
      size_t k = i;
      while (k < n && std::isdigit((unsigned char)tok[k])) k++;
      out->emplace_back(tok.substr(i, k - i));
      i = k;
    } else {
      i++;  // unreachable for alnum input; skip defensively
    }
  }
}

void lower_inplace(std::string* s) {
  for (auto& c : *s) c = (char)std::tolower((unsigned char)c);
}

// code_tokens(): identifiers (camel/snake split), digit runs, single punct.
void code_tokens(const char* text, int len, std::vector<std::string>* out) {
  int i = 0;
  std::vector<std::string> parts;
  while (i < len && (int)out->size() < kMaxToks) {
    unsigned char c = text[i];
    if (is_ident_start(c)) {
      int j = i;
      while (j < len && is_ident((unsigned char)text[j])) j++;
      std::string tok(text + i, text + j);
      i = j;
      if (tok.find('_') != std::string::npos) {
        parts.clear();
        size_t start = 0;
        while (start <= tok.size()) {
          size_t us = tok.find('_', start);
          if (us == std::string::npos) us = tok.size();
          if (us > start) parts.emplace_back(tok.substr(start, us - start));
          start = us + 1;
        }
      } else {
        bool all_digit = !tok.empty();
        for (char ch : tok)
          if (!std::isdigit((unsigned char)ch)) { all_digit = false; break; }
        if (!all_digit) {
          parts.clear();
          camel_split(tok, &parts);
        } else {
          parts.assign(1, tok);
        }
      }
      for (auto& p : parts) {
        if ((int)out->size() >= kMaxToks) break;
        lower_inplace(&p);
        out->push_back(p);
      }
    } else if (std::isdigit(c)) {
      int j = i;
      while (j < len && std::isdigit((unsigned char)text[j])) j++;
      out->emplace_back(text + i, text + j);
      i = j;
    } else if (std::isspace(c)) {
      i++;
    } else {
      out->emplace_back(1, (char)c);
      i++;
    }
  }
}

// Mirror of hash_embedder.STOP_TOKENS / _stopped() / STOP_FACTOR — the
// fixed IDF approximation is part of the embedding definition and the
// native path must stay byte-for-byte equivalent (tests/test_native_featurizer).
static const char* kStopTokens[] = {
    "the", "a", "an", "of", "to", "and", "or", "in", "on", "for", "is",
    "are", "was", "be", "as", "at", "by", "with", "from", "this", "that",
    "it", "if", "else", "elif", "return", "def", "class", "import",
    "none", "true", "false", "self", "cls", "not", "no", "new", "del",
    "try", "except", "finally", "raise", "pass", "while", "do", "switch",
    "case", "break", "continue", "static", "void", "const", "let", "var",
    "function", "public", "private", "protected", "virtual", "override",
    "template", "typename", "using", "namespace", "struct", "enum",
    "union", "extern", "inline", "operator", "sizeof", "nullptr", "null",
    "undefined", "type", "types", "value", "values", "arg", "args",
    "kwargs", "param", "params", "parameter", "parameters", "obj",
    "object", "data", "result", "results", "name", "names", "key",
    "keys", "item", "items", "list", "dict", "str", "int", "float",
    "bool", "double", "long", "short", "unsigned", "char", "auto",
    "index", "val", "num", "count", "size", "len", "length", "get",
    "set", "add", "when", "then", "than", "must", "should", "which",
    "where", "there", "these", "those", "such", "other", "into", "over",
    "only", "also", "each", "all", "any", "some", "more", "most", "can",
    "cannot", "may", "might", "will", "would", "use", "used", "uses",
    "given", "default", "optional", "returns", "same", "both", "two",
    "one", "first", "last", "next", "see", "note",
};

static const double kStopFactor = 0.3;

static bool is_stopped(const std::string& f) {
  if (f.find('\x1f') != std::string::npos) return false;  // bigram
  static const std::unordered_set<std::string> stop(
      kStopTokens, kStopTokens + sizeof(kStopTokens) / sizeof(kStopTokens[0]));
  if (stop.count(f)) return true;
  if (f.size() == 1) {
    unsigned char c = (unsigned char)f[0];
    if (!std::isalnum(c)) return true;
  }
  if (!f.empty()) {
    bool all_digits = true;
    for (unsigned char c : f)
      if (!std::isdigit(c)) { all_digits = false; break; }
    if (all_digits) return true;
  }
  return false;
}

struct Counter {
  std::unordered_map<std::string, int> index;
  std::vector<std::string> keys;  // insertion order
  std::vector<int> counts;

  void add(const std::string& key) {
    auto it = index.find(key);
    if (it == index.end()) {
      index.emplace(key, (int)keys.size());
      keys.push_back(key);
      counts.push_back(1);
    } else {
      counts[it->second]++;
    }
  }
};

}  // namespace

extern "C" {

// Featurize one text: writes up to max_features (bucket id, weight) pairs,
// zero-padded. Returns the number of live features.
int semcode_featurize(const char* text, int len, int max_features,
                      int n_buckets, int32_t* out_ids, float* out_weights) {
  std::vector<std::string> toks;
  toks.reserve(kMaxToks);
  code_tokens(text, len, &toks);

  Counter counts;
  for (const auto& t : toks) counts.add(t);
  for (size_t i = 0; i + 1 < toks.size(); i++) {
    std::string bg = toks[i];
    bg.push_back('\x1f');
    bg += toks[i + 1];
    counts.add(bg);
  }

  // stable sort by count desc (ties keep insertion order, matching Python)
  std::vector<int> idx(counts.keys.size());
  for (size_t i = 0; i < idx.size(); i++) idx[i] = (int)i;
  std::stable_sort(idx.begin(), idx.end(), [&](int a, int b) {
    return counts.counts[a] > counts.counts[b];
  });

  int n_out = (int)idx.size() < max_features ? (int)idx.size() : max_features;
  for (int i = 0; i < max_features; i++) {
    out_ids[i] = 0;
    out_weights[i] = 0.0f;
  }
  for (int i = 0; i < n_out; i++) {
    const std::string& f = counts.keys[idx[i]];
    int count = counts.counts[idx[i]];
    uint32_t crc = crc32(0L, (const Bytef*)f.data(), (uInt)f.size());
    float sign = ((crc >> 31) & 1u) == 0 ? 1.0f : -1.0f;
    out_ids[i] = (int32_t)(crc % (uint32_t)n_buckets);
    double w = (1.0 + std::log((double)count)) * (double)sign;
    if (is_stopped(f)) w *= kStopFactor;
    out_weights[i] = (float)w;
  }
  return n_out;
}

// Batch featurize: texts given as one concatenated buffer with offsets.
void semcode_featurize_batch(const char* buffer, const int64_t* offsets,
                             int n_texts, int max_features, int n_buckets,
                             int32_t* out_ids, float* out_weights) {
  for (int i = 0; i < n_texts; i++) {
    const char* start = buffer + offsets[i];
    int len = (int)(offsets[i + 1] - offsets[i]);
    semcode_featurize(start, len, max_features, n_buckets,
                      out_ids + (int64_t)i * max_features,
                      out_weights + (int64_t)i * max_features);
  }
}

// C/C++ comment/string/preprocessor stripping for the structural symbol
// scanner (semcode_tpu/chunking/cparse.py strip_noise). Byte-parity with the
// Python implementation is enforced by tests/test_cparse.py: the output is
// EXACTLY n bytes — every stripped character becomes a space, newlines are
// preserved so token line numbers survive. The Python char loop is the
// chunking hot spot on large C++ files; this is the same state machine in C.
void semcode_strip_noise(const char* s, long n, char* out) {
  long i = 0, o = 0;
  while (i < n) {
    char ch = s[i];
    char nxt = (i + 1 < n) ? s[i + 1] : '\0';
    if (ch == '/' && nxt == '/') {
      while (i < n && s[i] != '\n') { out[o++] = ' '; i++; }
    } else if (ch == '/' && nxt == '*') {
      out[o++] = ' '; out[o++] = ' '; i += 2;
      while (i < n && !(s[i] == '*' && i + 1 < n && s[i + 1] == '/')) {
        out[o++] = (s[i] == '\n') ? '\n' : ' ';
        i++;
      }
      if (i < n) { out[o++] = ' '; out[o++] = ' '; i += 2; }
    } else if (ch == '"' || ch == '\'') {
      char quote = ch;
      out[o++] = ' '; i++;
      while (i < n && s[i] != quote) {
        if (s[i] == '\\' && i + 1 < n) {
          out[o++] = ' ';
          out[o++] = (s[i + 1] == '\n') ? '\n' : ' ';
          i += 2;
          continue;
        }
        out[o++] = (s[i] == '\n') ? '\n' : ' ';
        i++;
      }
      if (i < n) { out[o++] = ' '; i++; }
    } else if (ch == '#' && (i == 0 || s[i - 1] == '\n')) {
      bool cont = true;
      while (i < n && cont) {
        cont = false;
        while (i < n && s[i] != '\n') {
          if (s[i] == '\\' && i + 1 < n && s[i + 1] == '\n') cont = true;
          out[o++] = ' ';
          i++;
        }
        if (i < n) { out[o++] = '\n'; i++; }
      }
    } else {
      out[o++] = ch;
      i++;
    }
  }
}

}  // extern "C"
