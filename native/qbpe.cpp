// Native BPE encoder core for the Qwen3-TTS text frontend.
//
// Implements the merge loop + vocab/byte-fallback lookup of the GPT-2/Qwen
// BPE tokenizer (behavioral parity with frontend/tokenizer.py, itself a
// re-implementation of the reference Swift tokenizer,
// reference Tokenizer/Qwen3Tokenizer.swift:254-374). Python keeps the
// pre-tokenization (special-token split, quote normalization, regex split,
// space/newline -> Ġ/Ċ mapping); this module takes one pre-split,
// pre-mapped word at a time and returns token ids.
//
// C ABI (ctypes-friendly), no exceptions across the boundary:
//   qbpe_new / qbpe_free
//   qbpe_add_token(handle, utf8, len, id)
//   qbpe_add_merge(handle, left, llen, right, rlen, rank)
//   qbpe_encode_word(handle, utf8, len, out_ids, max_out) -> n or -1
//
// Build: g++ -O2 -shared -fPIC -std=c++17 qbpe.cpp -o libqbpe.so

#include <cstdint>
#include <cstdio>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    std::hash<std::string> h;
    return h(p.first) * 1315423911u ^ h(p.second);
  }
};

struct Bpe {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash> merges;

  // Split UTF-8 into code-point strings (mirrors Python per-character BPE).
  static std::vector<std::string> split_codepoints(std::string_view s) {
    std::vector<std::string> out;
    size_t i = 0;
    while (i < s.size()) {
      unsigned char c = s[i];
      size_t n = 1;
      if (c >= 0xF0) n = 4;
      else if (c >= 0xE0) n = 3;
      else if (c >= 0xC0) n = 2;
      if (i + n > s.size()) n = 1;  // tolerate malformed input
      out.emplace_back(s.substr(i, n));
      i += n;
    }
    return out;
  }

  int encode_word(std::string_view word, int32_t* out, int max_out) const {
    std::vector<std::string> pieces = split_codepoints(word);
    if (pieces.empty()) return 0;

    // Iterative lowest-rank merge (reference Qwen3Tokenizer.swift:322-374).
    while (pieces.size() > 1) {
      int best_rank = -1;
      size_t best_idx = 0;
      for (size_t i = 0; i + 1 < pieces.size(); ++i) {
        auto it = merges.find({pieces[i], pieces[i + 1]});
        if (it != merges.end() && (best_rank < 0 || it->second < best_rank)) {
          best_rank = it->second;
          best_idx = i;
        }
      }
      if (best_rank < 0) break;
      pieces[best_idx] += pieces[best_idx + 1];
      pieces.erase(pieces.begin() + best_idx + 1);
    }

    int n = 0;
    char buf[8];
    for (const auto& piece : pieces) {
      auto it = vocab.find(piece);
      if (it != vocab.end()) {
        if (n >= max_out) return -1;
        out[n++] = it->second;
      } else {
        // byte fallback "<0xXX>" (reference Qwen3Tokenizer.swift:282-289)
        for (unsigned char b : piece) {
          std::snprintf(buf, sizeof(buf), "<0x%02X>", b);
          auto bit = vocab.find(buf);
          if (bit != vocab.end()) {
            if (n >= max_out) return -1;
            out[n++] = bit->second;
          }
        }
      }
    }
    return n;
  }
};

}  // namespace

extern "C" {

void* qbpe_new() { return new Bpe(); }

void qbpe_free(void* h) { delete static_cast<Bpe*>(h); }

void qbpe_add_token(void* h, const char* s, int len, int32_t id) {
  static_cast<Bpe*>(h)->vocab.emplace(std::string(s, len), id);
}

void qbpe_add_merge(void* h, const char* left, int llen, const char* right,
                    int rlen, int32_t rank) {
  static_cast<Bpe*>(h)->merges.emplace(
      std::make_pair(std::string(left, llen), std::string(right, rlen)), rank);
}

int qbpe_encode_word(void* h, const char* s, int len, int32_t* out, int max_out) {
  return static_cast<Bpe*>(h)->encode_word(std::string_view(s, len), out, max_out);
}

}  // extern "C"
