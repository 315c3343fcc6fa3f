// Native host-side FASTA/FASTQ parser + 2-bit-code encoder.
//
// The TPU feeds on fixed-shape [B, L] uint8 code batches; this C++ core
// turns raw FASTX bytes into those batches at memory bandwidth, replacing
// the numpy reference path in io/fasta.py for production streaming. The
// byte->code mapping matches nthash_tpu.constants.ASCII_TO_CODE (upper+lower
// ACGT, U/u = T, everything else the invalid code 4) — the same semantics
// as the reference's CONVERT_TAB/SEED_TAB (reference src/internal.hpp:
// 130-165, 350-418), re-expressed for the 5-code scheme.
//
// C ABI only (consumed via ctypes): no C++ types cross the boundary.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

constexpr uint8_t CODE_N = 4;

struct CodeTab {
  uint8_t tab[256];
  CodeTab() {
    memset(tab, CODE_N, sizeof(tab));
    tab[(unsigned)'A'] = tab[(unsigned)'a'] = 0;
    tab[(unsigned)'C'] = tab[(unsigned)'c'] = 1;
    tab[(unsigned)'G'] = tab[(unsigned)'g'] = 2;
    tab[(unsigned)'T'] = tab[(unsigned)'t'] = 3;
    tab[(unsigned)'U'] = tab[(unsigned)'u'] = 3;
  }
};
const CodeTab kCodes;

struct Parser {
  FILE* f = nullptr;
  std::vector<uint8_t> buf;   // read buffer
  size_t pos = 0;             // cursor into buf
  size_t len = 0;             // valid bytes in buf
  bool eof = false;
  int format = 0;             // 0 unknown, 1 fasta, 2 fastq
  std::string err;

  bool fill() {
    if (eof) return pos < len;
    if (pos > 0) {
      memmove(buf.data(), buf.data() + pos, len - pos);
      len -= pos;
      pos = 0;
    }
    if (len == buf.size()) buf.resize(buf.size() * 2);
    size_t got = fread(buf.data() + len, 1, buf.size() - len, f);
    len += got;
    if (got == 0) eof = true;
    return pos < len;
  }

  // Peek at the first byte of the next line (skipping blank lines) without
  // consuming it. Returns -1 at EOF. Safe across fill() compaction because
  // it only advances `pos` past separators.
  int peek(void) {
    for (;;) {
      while (pos < len && (buf[pos] == '\n' || buf[pos] == '\r')) pos++;
      if (pos < len) return buf[pos];
      if (eof) return -1;
      if (!fill()) return -1;
    }
  }

  // Return the next full line [start, end) (without newline); grows the
  // buffer as needed. Returns false at EOF with no data.
  bool next_line(size_t& start, size_t& end) {
    for (;;) {
      uint8_t* nl =
          (uint8_t*)memchr(buf.data() + pos, '\n', len - pos);
      if (nl) {
        start = pos;
        end = nl - buf.data();
        pos = end + 1;
        if (end > start && buf[end - 1] == '\r') --end;
        return true;
      }
      if (eof) {
        if (pos < len) {  // final unterminated line
          start = pos;
          end = len;
          pos = len;
          return true;
        }
        return false;
      }
      if (!fill() && pos >= len) return false;
    }
  }
};

void encode_into(const uint8_t* src, size_t n, uint8_t* dst) {
  for (size_t i = 0; i < n; i++) dst[i] = kCodes.tab[src[i]];
}

}  // namespace

extern "C" {

// Encode ASCII bytes to base codes (0-3 valid, 4 invalid). Thread-safe.
void nthash_encode(const uint8_t* ascii, int64_t n, uint8_t* out) {
  encode_into(ascii, (size_t)n, out);
}

void* nthash_parser_open(const char* path) {
  auto* p = new Parser();
  p->f = fopen(path, "rb");
  if (!p->f) {
    delete p;
    return nullptr;
  }
  p->buf.resize(1 << 20);
  return p;
}

void nthash_parser_close(void* handle) {
  auto* p = (Parser*)handle;
  if (p->f) fclose(p->f);
  delete p;
}

// Fill up to max_reads rows of out_codes [max_reads, row_len] with encoded
// reads (padded/truncated to row_len with the invalid code). out_lengths
// receives each read's true length. Returns the number of reads produced,
// 0 at EOF, -1 on malformed input.
int64_t nthash_parser_next_batch(void* handle, int64_t max_reads,
                                 int64_t row_len, uint8_t* out_codes,
                                 int64_t* out_lengths) {
  auto* p = (Parser*)handle;
  int64_t produced = 0;
  size_t s = 0, e = 0;
  std::vector<uint8_t> seq;  // multi-line FASTA accumulation
  while (produced < max_reads) {
    if (!p->next_line(s, e)) break;
    if (e == s) continue;  // blank line
    uint8_t c0 = p->buf[s];
    if (p->format == 0) p->format = (c0 == '@') ? 2 : 1;
    uint8_t* row = out_codes + produced * row_len;
    if (p->format == 2) {
      if (c0 != '@') {
        p->err = "malformed FASTQ header";
        return -1;
      }
      if (!p->next_line(s, e)) {
        p->err = "truncated FASTQ record";
        return -1;
      }
      int64_t n = (int64_t)(e - s);
      int64_t keep = n < row_len ? n : row_len;
      encode_into(p->buf.data() + s, (size_t)keep, row);
      memset(row + keep, CODE_N, (size_t)(row_len - keep));
      out_lengths[produced] = n;
      // '+' line and quality line
      if (!p->next_line(s, e) || p->buf[s] != '+') {
        p->err = "malformed FASTQ record: missing '+'";
        return -1;
      }
      if (!p->next_line(s, e)) {
        p->err = "truncated FASTQ quality";
        return -1;
      }
      produced++;
    } else {
      if (c0 != '>') {
        p->err = "malformed FASTA header";
        return -1;
      }
      seq.clear();
      // accumulate sequence lines until the next header / EOF
      for (;;) {
        int pb = p->peek();
        if (pb < 0 || pb == '>') break;
        size_t s2, e2;
        if (!p->next_line(s2, e2)) break;
        seq.insert(seq.end(), p->buf.data() + s2, p->buf.data() + e2);
      }
      int64_t n = (int64_t)seq.size();
      int64_t keep = n < row_len ? n : row_len;
      encode_into(seq.data(), (size_t)keep, row);
      memset(row + keep, CODE_N, (size_t)(row_len - keep));
      out_lengths[produced] = n;
      produced++;
    }
  }
  return produced;
}

const char* nthash_parser_error(void* handle) {
  return ((Parser*)handle)->err.c_str();
}

}  // extern "C"
