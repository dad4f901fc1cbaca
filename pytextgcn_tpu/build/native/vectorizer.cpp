// Native (C++) corpus vectorizer: tokenize + vocabulary fit + sparse counts
// + token-id encoding, for ASCII documents.
//
// The reference's preprocessing burns its time in Python-level loops
// (CountVectorizer + a joblib'd nltk re-tokenization, text2graph.py:28-44,
// 130-131). This kernel does the whole host-side pass in one scan per
// document with an open-addressing string hash map. Semantics are exact for
// ASCII text (token = maximal run of [A-Za-z0-9_], lowercased; counted if
// length >= 2 and not a stopword; df-pruned by min_df/max_df; vocabulary
// sorted bytewise — byte-identical to the Python path for pure-ASCII
// corpora, which is why the bridge routes non-ASCII corpora to Python).
//
// Interface (C ABI, ctypes): documents arrive as one UTF-8 buffer with
// per-document offsets; results go back as malloc'd arrays released with
// tg_free (declared in graphbuilder.cpp).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

inline bool is_word(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_';
}

inline char lower(char c) { return (c >= 'A' && c <= 'Z') ? c + 32 : c; }

struct Vocab {
  std::vector<std::string> terms;             // insertion order
  std::unordered_map<std::string, int64_t> ids;
};

}  // namespace

extern "C" {

// Fit + transform:
//   text:     concatenated documents (UTF-8/ASCII)
//   offsets:  int64[n_docs + 1] document byte ranges
//   stop:     newline-separated stopword list (may be empty)
//   min_doc_count / max_doc_count: absolute df bounds (inclusive)
// Outputs (malloc'd):
//   vocab_out:      '\n'-joined sorted vocabulary, *vocab_len bytes
//   indptr_out:     int64[n_docs + 1] CSR row pointers
//   indices_out:    int32[nnz] sorted column ids per row
//   data_out:       int64[nnz] counts
// Returns number of vocabulary terms (< 0 on error).
int64_t tg_fit_counts(const char* text, const int64_t* offsets, int64_t n_docs,
                      const char* stop, int64_t min_doc_count,
                      int64_t max_doc_count, char** vocab_out,
                      int64_t* vocab_len, int64_t** indptr_out,
                      int32_t** indices_out, int64_t** data_out,
                      int64_t* nnz_out) {
  std::unordered_set<std::string> stopset;
  {
    const char* p = stop;
    while (p && *p) {
      const char* q = strchr(p, '\n');
      size_t len = q ? (size_t)(q - p) : strlen(p);
      if (len) stopset.emplace(p, len);
      p = q ? q + 1 : nullptr;
    }
  }

  Vocab raw;
  std::vector<std::vector<int64_t>> doc_terms(n_docs);  // raw ids per doc
  std::string tok;
  for (int64_t d = 0; d < n_docs; ++d) {
    const char* b = text + offsets[d];
    const char* e = text + offsets[d + 1];
    auto& list = doc_terms[d];
    const char* p = b;
    while (p < e) {
      while (p < e && !is_word((unsigned char)*p)) ++p;
      const char* t0 = p;
      while (p < e && is_word((unsigned char)*p)) ++p;
      if (p - t0 >= 2) {
        tok.assign(t0, p - t0);
        for (auto& c : tok) c = lower(c);
        if (!stopset.count(tok)) {
          auto it = raw.ids.find(tok);
          int64_t id;
          if (it == raw.ids.end()) {
            id = (int64_t)raw.terms.size();
            raw.ids.emplace(tok, id);
            raw.terms.push_back(tok);
          } else {
            id = it->second;
          }
          list.push_back(id);
        }
      }
    }
  }

  // document frequency
  std::vector<int64_t> df(raw.terms.size(), 0);
  {
    std::vector<int64_t> seen(raw.terms.size(), -1);
    for (int64_t d = 0; d < n_docs; ++d)
      for (int64_t id : doc_terms[d])
        if (seen[id] != d) {
          seen[id] = d;
          ++df[id];
        }
  }

  // prune + sort surviving terms bytewise
  std::vector<int64_t> keep;
  for (size_t i = 0; i < raw.terms.size(); ++i)
    if (df[i] >= min_doc_count && df[i] <= max_doc_count) keep.push_back(i);
  if (keep.empty()) return -2;
  std::sort(keep.begin(), keep.end(), [&](int64_t a, int64_t b) {
    return raw.terms[a] < raw.terms[b];
  });
  std::vector<int32_t> remap(raw.terms.size(), -1);
  for (size_t i = 0; i < keep.size(); ++i) remap[keep[i]] = (int32_t)i;

  // vocabulary string
  size_t vlen = 0;
  for (int64_t id : keep) vlen += raw.terms[id].size() + 1;
  char* vbuf = (char*)std::malloc(vlen);
  if (!vbuf) return -1;
  {
    char* p = vbuf;
    for (int64_t id : keep) {
      const std::string& s = raw.terms[id];
      std::memcpy(p, s.data(), s.size());
      p += s.size();
      *p++ = '\n';
    }
  }

  // CSR counts (columns sorted per row)
  int64_t* indptr = (int64_t*)std::malloc(sizeof(int64_t) * (n_docs + 1));
  if (!indptr) return -1;  // MemoryError on the Python side, like every
                           // other allocation in this file
  std::vector<int32_t> cols;
  std::vector<int64_t> vals;
  std::vector<std::pair<int32_t, int64_t>> rowbuf;
  indptr[0] = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    rowbuf.clear();
    std::unordered_map<int32_t, int64_t> cnt;
    for (int64_t id : doc_terms[d]) {
      int32_t c = remap[id];
      if (c >= 0) ++cnt[c];
    }
    rowbuf.assign(cnt.begin(), cnt.end());
    std::sort(rowbuf.begin(), rowbuf.end());
    for (auto& kv : rowbuf) {
      cols.push_back(kv.first);
      vals.push_back(kv.second);
    }
    indptr[d + 1] = (int64_t)cols.size();
  }
  int32_t* indices = (int32_t*)std::malloc(sizeof(int32_t) * std::max<size_t>(cols.size(), 1));
  int64_t* data = (int64_t*)std::malloc(sizeof(int64_t) * std::max<size_t>(vals.size(), 1));
  if (!indices || !data) {
    std::free(vbuf);
    std::free(indptr);
    std::free(indices);
    std::free(data);
    return -1;
  }
  std::memcpy(indices, cols.data(), sizeof(int32_t) * cols.size());
  std::memcpy(data, vals.data(), sizeof(int64_t) * vals.size());

  *vocab_out = vbuf;
  *vocab_len = (int64_t)vlen;
  *indptr_out = indptr;
  *indices_out = indices;
  *data_out = data;
  *nnz_out = (int64_t)cols.size();
  return (int64_t)keep.size();
}

// Encode documents to padded token-id rows (the reference's _encode_input):
// every \w+ token (length >= 1!) that is IN the vocabulary, truncated to
// max_length (<= 0 disables), padded with -1 to the corpus max.
// vocab arrives as the '\n'-joined sorted list from tg_fit_counts.
// Returns max_len (row width); tokens_out is int32[n_docs * max_len].
int64_t tg_encode(const char* text, const int64_t* offsets, int64_t n_docs,
                  const char* vocab, int64_t max_length,
                  int32_t** tokens_out) {
  std::unordered_map<std::string, int32_t> ids;
  {
    const char* p = vocab;
    int32_t next = 0;
    while (p && *p) {
      const char* q = strchr(p, '\n');
      size_t len = q ? (size_t)(q - p) : strlen(p);
      if (len) ids.emplace(std::string(p, len), next++);
      p = q ? q + 1 : nullptr;
    }
  }
  std::vector<std::vector<int32_t>> enc(n_docs);
  std::string tok;
  int64_t max_len = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    const char* b = text + offsets[d];
    const char* e = text + offsets[d + 1];
    auto& row = enc[d];
    const char* p = b;
    while (p < e) {
      while (p < e && !is_word((unsigned char)*p)) ++p;
      const char* t0 = p;
      while (p < e && is_word((unsigned char)*p)) ++p;
      if (p > t0) {
        if (max_length > 0 && (int64_t)row.size() >= max_length) continue;
        tok.assign(t0, p - t0);
        for (auto& c : tok) c = lower(c);
        auto it = ids.find(tok);
        if (it != ids.end()) row.push_back(it->second);
      }
    }
    if (max_length > 0 && (int64_t)row.size() > max_length)
      row.resize(max_length);
    max_len = std::max<int64_t>(max_len, (int64_t)row.size());
  }
  int32_t* out = (int32_t*)std::malloc(
      sizeof(int32_t) * std::max<int64_t>(n_docs * max_len, 1));
  if (!out) return -1;
  for (int64_t d = 0; d < n_docs; ++d) {
    int64_t i = 0;
    for (; i < (int64_t)enc[d].size(); ++i) out[d * max_len + i] = enc[d][i];
    for (; i < max_len; ++i) out[d * max_len + i] = -1;
  }
  *tokens_out = out;
  return max_len;
}

}  // extern "C"
