// Native SentencePiece encoder: byte-trie unigram Viterbi + heap-based BPE merge.
//
// The reference's llama2 tokenizer wraps the sentencepiece C++ library
// (llama_tokenizers.py:14-27). This framework vendors a pure-Python reader
// (llama_x_tpu/data/sentencepiece.py) for the protobuf/model handling and delegates
// the hot encode loop here: the Python Viterbi runs ~0.5 MB/s, which turns the
// tokenize-once pass over MetaMathQA (~300 MB of text) into ~10 minutes; this
// implementation mirrors its semantics byte-for-byte at native speed.
//
// Semantics contract (MUST match sentencepiece.py — tests compare both paths):
// - input is the ALREADY-NORMALIZED utf-8 text (dummy prefix + space escaping are
//   done host-side);
// - unigram: Viterbi max-score segmentation; candidates per start position are
//   NORMAL/USER_DEFINED pieces in ascending length, then a one-CODEPOINT unk step
//   with penalty min(NORMAL scores) - 10; strict '>' relaxation (first candidate
//   wins ties); unk spans emit <0xXX> byte pieces in byte order.
// - BPE: greedy highest-score adjacent merge over unicode codepoints; the agenda is
//   a min-heap on (-score, left-symbol index, merged-string) exactly like the Python
//   heapq tuple; stale entries skipped by liveness + text-equality checks; leftover
//   symbols emit their piece id unless UNUSED, else byte fallback.
//
// C ABI (ctypes):
//   spm_create(blob, len) -> handle      blob: u32 n; then per piece
//                                        f32 score, u8 type, u32 len, bytes text
//   spm_encode_unigram(h, text, len, out, cap) -> n_ids (or -1 if cap too small)
//   spm_encode_bpe(h, text, len, out, cap) -> n_ids (or -1)
//   spm_free(h)

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kNormal = 1, kUnknown = 2, kUserDefined = 4, kUnused = 5, kByte = 6;

struct TrieNode {
  // sparse children: (byte, node) pairs; pieces are short so linear scan wins
  std::vector<std::pair<uint8_t, int32_t>> kids;
  int32_t piece_id = -1;  // terminal: NORMAL/USER_DEFINED piece ending here
  int32_t any_id = -1;    // terminal: piece of ANY type (BPE emission lookup)

  int32_t find(uint8_t b) const {
    for (const auto& [kb, kn] : kids)
      if (kb == b) return kn;
    return -1;
  }
};

struct Model {
  std::vector<float> scores;
  std::vector<uint8_t> types;
  std::vector<std::string> texts;
  std::vector<TrieNode> trie;         // matching trie over NORMAL/USER_DEFINED pieces
  std::unordered_map<std::string, int32_t> piece_to_id;  // LAST occurrence wins (≡ python dict comprehension)
  int32_t byte_ids[256];
  bool has_bytes = false;
  bool seen_unk = false;
  int32_t unk_id = 0;
  double unk_penalty = -20.0;

  void add_to_trie(const std::string& text, int32_t id, bool match_eligible) {
    int32_t node = 0;
    for (unsigned char b : text) {
      int32_t nxt = trie[node].find(b);
      if (nxt < 0) {
        nxt = (int32_t)trie.size();
        trie[node].kids.emplace_back(b, nxt);
        trie.emplace_back();
      }
      node = nxt;
    }
    // called once per unique text (from the final, last-occurrence-wins map)
    if (match_eligible) trie[node].piece_id = id;
    trie[node].any_id = id;
  }

  // exact-match lookup of a byte span; returns (piece_id, any_id) terminals or -1s
  std::pair<int32_t, int32_t> lookup(const uint8_t* s, int64_t len) const {
    int32_t node = 0;
    for (int64_t i = 0; i < len; ++i) {
      node = trie[node].find(s[i]);
      if (node < 0) return {-1, -1};
    }
    return {trie[node].piece_id, trie[node].any_id};
  }
};

inline int cp_len(uint8_t lead) {
  if (lead < 0x80) return 1;
  if (lead < 0xC0) return 1;  // stray continuation byte: treat as 1 (python str never yields this)
  if (lead < 0xE0) return 2;
  if (lead < 0xF0) return 3;
  return 4;
}

int64_t emit_bytes(const Model& m, const uint8_t* s, int64_t n, int32_t* out, int64_t cap, int64_t k) {
  // byte fallback for an uncovered span (one id per byte; unk_id if no byte pieces)
  if (!m.has_bytes) {
    if (k >= cap) return -1;
    out[k++] = m.unk_id;
    return k;
  }
  for (int64_t i = 0; i < n; ++i) {
    if (k >= cap) return -1;
    out[k++] = m.byte_ids[s[i]];
  }
  return k;
}

}  // namespace

extern "C" {

void* spm_create(const uint8_t* blob, uint64_t blob_len) {
  auto* m = new Model();
  uint64_t off = 0;
  auto rd_u32 = [&]() { uint32_t v; std::memcpy(&v, blob + off, 4); off += 4; return v; };
  auto rd_f32 = [&]() { float v; std::memcpy(&v, blob + off, 4); off += 4; return v; };
  uint32_t n = rd_u32();
  m->scores.reserve(n);
  m->types.reserve(n);
  m->texts.reserve(n);
  m->trie.emplace_back();  // root
  for (int32_t i = 0; i < 256; ++i) m->byte_ids[i] = -1;  // -1 -> unk_id after parse

  double min_normal = 0.0;
  bool any_normal = false;
  for (uint32_t i = 0; i < n && off < blob_len; ++i) {
    float score = rd_f32();
    uint8_t type = blob[off++];
    uint32_t len = rd_u32();
    std::string text((const char*)blob + off, len);
    off += len;
    m->scores.push_back(score);
    m->types.push_back(type);
    // python: next(i for i, p in enumerate(pieces) if p.type == UNKNOWN) — FIRST wins
    if (type == kUnknown && !m->seen_unk) {
      m->unk_id = (int32_t)i;
      m->seen_unk = true;
    }
    if (type == kByte && len >= 5) {
      // "<0xAB>"
      auto hex = [](char c) { return c <= '9' ? c - '0' : (c | 32) - 'a' + 10; };
      m->byte_ids[(hex(text[3]) << 4) | hex(text[4])] = (int32_t)i;
      m->has_bytes = true;
    }
    if (type == kNormal && (!any_normal || score < min_normal)) {
      min_normal = score;
      any_normal = true;
    }
    m->piece_to_id[text] = (int32_t)i;  // python dict comprehension: LAST wins
    m->texts.push_back(std::move(text));
  }
  m->unk_penalty = (any_normal ? min_normal : -10.0) - 10.0;
  for (int32_t i = 0; i < 256; ++i)
    if (m->byte_ids[i] < 0) m->byte_ids[i] = m->unk_id;  // python: byte_ids.get(b, unk_id)
  // trie built from the FINAL map so duplicate piece texts resolve exactly like the
  // python piece_to_id lookup (last occurrence decides id and match eligibility)
  for (const auto& [text, id] : m->piece_to_id) {
    uint8_t t = m->types[id];
    m->add_to_trie(text, id, t == kNormal || t == kUserDefined);
  }
  return m;
}

void spm_free(void* h) { delete (Model*)h; }

int64_t spm_encode_unigram(void* h, const uint8_t* text, uint64_t text_len, int32_t* out, uint64_t out_cap) {
  const Model& m = *(const Model*)h;
  const int64_t n = (int64_t)text_len;
  if (n == 0) return 0;
  constexpr double NEG = -1e18;
  std::vector<double> best(n + 1, NEG);
  std::vector<int64_t> back_start(n + 1, 0);
  std::vector<int32_t> back_id(n + 1, -1);  // -1 = unk span (byte fallback)
  best[0] = 0.0;

  for (int64_t i = 0; i < n; ++i) {
    if (best[i] == NEG) continue;
    // pieces: trie walk enumerates matches in ascending length (ties: first wins,
    // matching the python ln-ascending loop with strict '>')
    int32_t node = 0;
    for (int64_t j = i; j < n; ++j) {
      node = m.trie[node].find(text[j]);
      if (node < 0) break;
      int32_t pid = m.trie[node].piece_id;
      if (pid >= 0) {
        double s = best[i] + m.scores[pid];
        if (s > best[j + 1]) {
          best[j + 1] = s;
          back_start[j + 1] = i;
          back_id[j + 1] = pid;
        }
      }
    }
    // unk: advance one codepoint (after the piece candidates, strict '>')
    int64_t step = cp_len(text[i]);
    if (i + step > n) step = n - i;
    double s = best[i] + m.unk_penalty;
    if (s > best[i + step]) {
      best[i + step] = s;
      back_start[i + step] = i;
      back_id[i + step] = -1;
    }
  }

  // backtrack (collect segments reversed, then emit forward)
  std::vector<std::pair<int64_t, int32_t>> segs;  // (start, id|-1), from the end
  int64_t pos = n;
  while (pos > 0) {
    segs.emplace_back(back_start[pos], back_id[pos]);
    pos = back_start[pos];
  }
  int64_t k = 0;
  int64_t end = 0;
  for (auto it = segs.rbegin(); it != segs.rend(); ++it) {
    int64_t start = it->first;
    // segment end = next segment's start (recompute going forward)
    int64_t seg_end = (it + 1) != segs.rend() ? (it + 1)->first : n;
    if (it->second < 0) {
      k = emit_bytes(m, text + start, seg_end - start, out, (int64_t)out_cap, k);
      if (k < 0) return -1;
    } else {
      if (k >= (int64_t)out_cap) return -1;
      out[k++] = it->second;
    }
    end = seg_end;
  }
  (void)end;
  return k;
}

int64_t spm_encode_bpe(void* h, const uint8_t* text, uint64_t text_len, int32_t* out, uint64_t out_cap) {
  const Model& m = *(const Model*)h;
  const int64_t n = (int64_t)text_len;
  if (n == 0) return 0;

  // symbols are (offset, length) SPANS of the input: merges of adjacent symbols are
  // always contiguous, so no string is ever materialized. A symbol's offset never
  // changes, so a heap entry's expected merged span is fully described by
  // (i, total_len); the python tuple's lexicographic merged-string tie-break reduces
  // to ascending total_len (same offset => one span is a prefix of the other).
  struct Sym {
    int64_t off, len, prev, next;
    bool alive;
  };
  std::vector<Sym> syms;
  for (int64_t i = 0; i < n;) {
    int len = cp_len(text[i]);
    if (i + len > n) len = (int)(n - i);
    int64_t idx = (int64_t)syms.size();
    syms.push_back({i, (int64_t)len, idx - 1, idx + 1, true});
    i += len;
  }
  const int64_t ns = (int64_t)syms.size();

  struct Entry {
    float neg_score;
    int64_t i;
    int64_t merged_len;
    bool operator>(const Entry& o) const {
      if (neg_score != o.neg_score) return neg_score > o.neg_score;
      if (i != o.i) return i > o.i;
      return merged_len > o.merged_len;
    }
  };
  std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;

  auto push_pair = [&](int64_t i) {
    if (i < 0) return;
    int64_t j = syms[i].next;
    if (j >= ns) return;
    int64_t len = syms[i].len + syms[j].len;
    int32_t pid = m.lookup(text + syms[i].off, len).first;  // NORMAL/USER_DEFINED only
    if (pid < 0) return;
    heap.push({-m.scores[pid], i, len});
  };

  for (int64_t i = 0; i + 1 < ns; ++i) push_pair(i);

  while (!heap.empty()) {
    Entry e = heap.top();
    heap.pop();
    int64_t i = e.i, j = syms[i].next;
    if (!syms[i].alive || j >= ns || !syms[j].alive || syms[i].len + syms[j].len != e.merged_len)
      continue;  // stale: a participant merged away since this entry was pushed
    syms[i].len = e.merged_len;
    syms[j].alive = false;
    syms[i].next = syms[j].next;
    if (syms[i].next < ns) syms[syms[i].next].prev = i;
    push_pair(syms[i].prev);
    push_pair(i);
  }

  int64_t k = 0;
  for (const auto& s : syms) {
    if (!s.alive) continue;
    int32_t any = m.lookup(text + s.off, s.len).second;
    if (any >= 0 && m.types[any] != kUnused) {
      if (k >= (int64_t)out_cap) return -1;
      out[k++] = any;
    } else {
      k = emit_bytes(m, text + s.off, s.len, out, (int64_t)out_cap, k);
      if (k < 0) return -1;
    }
  }
  return k;
}

}  // extern "C"
