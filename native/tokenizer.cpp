// Native CLIP BPE encoder.
//
// The reference implements its tokenizer in native (Mojo) code — a binary
// vocab reader plus greedy pair merging (helpers/utils.mojo:228-327).  This
// is the TPU build's native analogue, implementing the REAL CLIP algorithm
// (rank-ordered BPE over byte-to-unicode symbols with </w> word markers)
// exactly as sdtpu/tokenizer/bpe.py does, for the host-side hot path of
// high-throughput serving.  Exposed through a C ABI consumed via ctypes
// (sdtpu/tokenizer/native.py); scope is ASCII prompts — the wrapper routes
// non-ASCII text to the Python implementation, and tests cross-check the two
// token-for-token.
//
// Build: make -C native   (produces libsdtpu_native.so)

#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <limits>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// bytes_to_unicode (GPT-2/CLIP): byte -> printable unicode codepoint
// ---------------------------------------------------------------------------

std::string codepoint_to_utf8(uint32_t cp) {
  std::string out;
  if (cp < 0x80) {
    out.push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
  return out;
}

std::vector<std::string> byte_encoder_table() {
  std::vector<uint32_t> cps(256, 0);
  std::vector<bool> direct(256, false);
  auto mark = [&](int lo, int hi) {
    for (int b = lo; b <= hi; ++b) {
      cps[b] = b;
      direct[b] = true;
    }
  };
  mark('!', '~');
  mark(0xA1, 0xAC);
  mark(0xAE, 0xFF);
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    if (!direct[b]) cps[b] = 256 + n++;
  }
  std::vector<std::string> table(256);
  for (int b = 0; b < 256; ++b) table[b] = codepoint_to_utf8(cps[b]);
  return table;
}

// ---------------------------------------------------------------------------
// Minimal JSON parser for the flat {"token": id, ...} vocab.json shape
// ---------------------------------------------------------------------------

bool parse_json_string(const std::string& s, size_t& i, std::string& out) {
  if (s[i] != '"') return false;
  ++i;
  out.clear();
  while (i < s.size() && s[i] != '"') {
    char c = s[i];
    if (c == '\\') {
      ++i;
      if (i >= s.size()) return false;
      char e = s[i];
      switch (e) {
        case '"': out.push_back('"'); break;
        case '\\': out.push_back('\\'); break;
        case '/': out.push_back('/'); break;
        case 'b': out.push_back('\b'); break;
        case 'f': out.push_back('\f'); break;
        case 'n': out.push_back('\n'); break;
        case 'r': out.push_back('\r'); break;
        case 't': out.push_back('\t'); break;
        case 'u': {
          if (i + 4 >= s.size()) return false;
          uint32_t cp = static_cast<uint32_t>(
              std::stoul(s.substr(i + 1, 4), nullptr, 16));
          i += 4;
          // surrogate pairs
          if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 < s.size() &&
              s[i + 1] == '\\' && s[i + 2] == 'u') {
            uint32_t lo = static_cast<uint32_t>(
                std::stoul(s.substr(i + 3, 4), nullptr, 16));
            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
            i += 6;
            out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
            break;
          }
          out += codepoint_to_utf8(cp);
          break;
        }
        default:
          return false;
      }
      ++i;
    } else {
      out.push_back(c);
      ++i;
    }
  }
  if (i >= s.size()) return false;
  ++i;  // closing quote
  return true;
}

// ---------------------------------------------------------------------------
// Tokenizer state
// ---------------------------------------------------------------------------

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    return std::hash<std::string>()(p.first) * 1000003 ^
           std::hash<std::string>()(p.second);
  }
};

struct Tokenizer {
  std::unordered_map<std::string, int64_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
  std::vector<std::string> byte_enc = byte_encoder_table();
  int64_t bos = -1, eos = -1;
  std::string error;

  bool load_vocab(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
      error = "cannot open vocab file";
      return false;
    }
    std::stringstream ss;
    ss << f.rdbuf();
    std::string s = ss.str();
    size_t i = 0;
    auto skip_ws = [&] {
      while (i < s.size() && std::isspace(static_cast<unsigned char>(s[i])))
        ++i;
    };
    skip_ws();
    if (i >= s.size() || s[i] != '{') {
      error = "vocab.json: expected object";
      return false;
    }
    ++i;
    while (true) {
      skip_ws();
      if (i < s.size() && s[i] == '}') break;
      std::string key;
      if (!parse_json_string(s, i, key)) {
        error = "vocab.json: bad key";
        return false;
      }
      skip_ws();
      if (i >= s.size() || s[i] != ':') {
        error = "vocab.json: expected ':'";
        return false;
      }
      ++i;
      skip_ws();
      size_t end;
      int64_t id = std::stoll(s.substr(i), &end);
      i += end;
      vocab.emplace(std::move(key), id);
      skip_ws();
      if (i < s.size() && s[i] == ',') ++i;
    }
    auto b = vocab.find("<|startoftext|>");
    auto e = vocab.find("<|endoftext|>");
    if (b == vocab.end() || e == vocab.end()) {
      error = "vocab.json: missing special tokens";
      return false;
    }
    bos = b->second;
    eos = e->second;
    return true;
  }

  bool load_merges(const char* path) {
    std::ifstream f(path);
    if (!f) {
      error = "cannot open merges file";
      return false;
    }
    std::string line;
    int rank = 0;
    while (std::getline(f, line)) {
      if (line.empty() || line.rfind("#version", 0) == 0) continue;
      if (!line.empty() && line.back() == '\r') line.pop_back();
      size_t sp = line.find(' ');
      if (sp == std::string::npos) continue;
      ranks.emplace(std::make_pair(line.substr(0, sp), line.substr(sp + 1)),
                    rank++);
    }
    return true;
  }

  // BPE over one mapped word (vector of symbols, last carries </w>)
  std::vector<std::string> bpe(std::vector<std::string> word) const {
    if (word.size() < 2) return word;
    while (true) {
      int best_rank = std::numeric_limits<int>::max();
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < word.size(); ++i) {
        auto it = ranks.find({word[i], word[i + 1]});
        if (it != ranks.end() && it->second < best_rank) {
          best_rank = it->second;
          best_i = i;
        }
      }
      if (best_rank == std::numeric_limits<int>::max()) break;
      // merge ALL occurrences of the best pair, left to right
      const std::string first = word[best_i];
      const std::string second = word[best_i + 1];
      std::vector<std::string> next;
      next.reserve(word.size());
      for (size_t i = 0; i < word.size();) {
        if (i + 1 < word.size() && word[i] == first && word[i + 1] == second) {
          next.push_back(first + second);
          i += 2;
        } else {
          next.push_back(word[i]);
          ++i;
        }
      }
      word.swap(next);
      if (word.size() == 1) break;
    }
    return word;
  }

  // ASCII-only CLIP split pattern: contraction suffixes, letter runs, single
  // digits, punctuation runs (everything else non-space).
  // Matches the semantics of bpe.py's _PAT for ASCII input.
  std::vector<std::string> split(const std::string& text) const {
    std::vector<std::string> out;
    size_t i = 0;
    const size_t n = text.size();
    auto is_letter = [](char c) { return std::isalpha(static_cast<unsigned char>(c)); };
    auto is_digit = [](char c) { return std::isdigit(static_cast<unsigned char>(c)); };
    auto is_space = [](char c) { return std::isspace(static_cast<unsigned char>(c)); };
    static const char* suffixes[] = {"'s", "'t", "'re", "'ve", "'m", "'ll", "'d"};
    while (i < n) {
      if (is_space(text[i])) {
        ++i;
        continue;
      }
      // contraction suffixes (text is already lowercase)
      bool matched = false;
      if (text[i] == '\'') {
        for (const char* suf : suffixes) {
          size_t len = std::strlen(suf);
          if (text.compare(i, len, suf) == 0) {
            out.emplace_back(text.substr(i, len));
            i += len;
            matched = true;
            break;
          }
        }
      }
      if (matched) continue;
      if (is_letter(text[i])) {
        size_t j = i;
        while (j < n && is_letter(text[j])) ++j;
        out.emplace_back(text.substr(i, j - i));
        i = j;
      } else if (is_digit(text[i])) {
        out.emplace_back(text.substr(i, 1));
        ++i;
      } else {
        // run of non-space, non-letter, non-digit (underscore included)
        size_t j = i;
        while (j < n && !is_space(text[j]) && !is_letter(text[j]) &&
               !is_digit(text[j]))
          ++j;
        out.emplace_back(text.substr(i, j - i));
        i = j;
      }
    }
    return out;
  }

  // encode: whitespace-clean + lowercase + split + byte-map + BPE + frame/pad
  int64_t encode(const std::string& raw, int64_t* out, int64_t max_len) const {
    // whitespace_clean + strip + lower (ASCII)
    std::string text;
    text.reserve(raw.size());
    bool in_space = false;
    for (char c : raw) {
      if (std::isspace(static_cast<unsigned char>(c))) {
        in_space = true;
        continue;
      }
      if (in_space && !text.empty()) text.push_back(' ');
      in_space = false;
      text.push_back(
          static_cast<char>(std::tolower(static_cast<unsigned char>(c))));
    }

    std::vector<int64_t> ids;
    ids.push_back(bos);
    for (const std::string& tok : split(text)) {
      std::vector<std::string> word;
      word.reserve(tok.size());
      for (size_t i = 0; i < tok.size(); ++i) {
        std::string sym = byte_enc[static_cast<unsigned char>(tok[i])];
        if (i + 1 == tok.size()) sym += "</w>";
        word.push_back(std::move(sym));
      }
      for (const std::string& piece : bpe(std::move(word))) {
        auto it = vocab.find(piece);
        if (it == vocab.end()) return -1;  // unknown symbol: caller falls back
        ids.push_back(it->second);
      }
    }
    if (max_len > 0 && static_cast<int64_t>(ids.size()) > max_len - 1)
      ids.resize(max_len - 1);
    ids.push_back(eos);
    if (max_len > 0)
      while (static_cast<int64_t>(ids.size()) < max_len) ids.push_back(eos);
    int64_t count = static_cast<int64_t>(ids.size());
    std::memcpy(out, ids.data(), count * sizeof(int64_t));
    return count;
  }
};

}  // namespace

extern "C" {

void* sdtpu_tokenizer_create(const char* vocab_path, const char* merges_path) {
  auto* t = new Tokenizer();
  if (!t->load_vocab(vocab_path) || !t->load_merges(merges_path)) {
    delete t;
    return nullptr;
  }
  return t;
}

void sdtpu_tokenizer_destroy(void* handle) {
  delete static_cast<Tokenizer*>(handle);
}

// Returns number of ids written to `out` (caller allocates >= max_len or a
// generous buffer when max_len == 0), or -1 on unknown symbol.
int64_t sdtpu_tokenizer_encode(void* handle, const char* text, int64_t* out,
                               int64_t max_len) {
  return static_cast<Tokenizer*>(handle)->encode(text, out, max_len);
}

int64_t sdtpu_tokenizer_bos(void* handle) {
  return static_cast<Tokenizer*>(handle)->bos;
}

int64_t sdtpu_tokenizer_eos(void* handle) {
  return static_cast<Tokenizer*>(handle)->eos;
}

}  // extern "C"
