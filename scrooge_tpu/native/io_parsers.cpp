// Native FASTA/FASTQ parsers — the role of the reference's C++ I/O layer
// (/root/reference/src/util.cpp:45-157: read_fasta multi-sequence
// concatenation, read_fastq 4-line records). Semantics mirror
// scrooge_tpu/io.py's Python parsers EXACTLY (tests pin equality); the
// Python layer slices descriptions/contents out of the buffers filled
// here, so no per-record allocation crosses the boundary.
//
// Contract (both functions):
//  - `buf`/`n`: the whole file image.
//  - content bytes for record i are content[content_ends[i-1] ..
//    content_ends[i]) (content_ends[-1] == 0 implied).
//  - returns the record count, or -1 if `cap` records would be exceeded
//    (caller sizes cap from a cheap upper bound and falls back on -1).

#include <cstdint>
#include <cstring>

namespace {

inline bool is_space(uint8_t c) {
  return c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\v' ||
         c == '\f';
}

// [line_start, line_end) excludes the line terminator. Universal
// newlines like Python's text mode: '\n', '\r' and '\r\n' all end a
// line (a lone '\r' is a break, not content).
inline int64_t line_end(const uint8_t *buf, int64_t start, int64_t n,
                        int64_t *next) {
  int64_t e = start;
  while (e < n && buf[e] != '\n' && buf[e] != '\r') e++;
  if (e >= n) {
    *next = n;
  } else if (buf[e] == '\r' && e + 1 < n && buf[e + 1] == '\n') {
    *next = e + 2;
  } else {
    *next = e + 1;
  }
  return e;
}

}  // namespace

extern "C" {

// FASTA: '>' lines start a sequence; description = line[1:] (spaces
// kept); content lines are appended with all ' ' removed; lines before
// the first '>' are ignored.
// Count-only mode: content == nullptr (first pass sizes the arrays).
int64_t fasta_parse(const uint8_t *buf, int64_t n, uint8_t *content,
                    int64_t *content_ends, int64_t *desc_starts,
                    int64_t *desc_ends, int64_t cap) {
  const bool counting = content == nullptr;
  int64_t count = 0, cpos = 0, pos = 0;
  bool in_seq = false;
  while (pos < n) {
    int64_t next, end = line_end(buf, pos, n, &next);
    if (pos < end && buf[pos] == '>') {
      if (!counting) {
        if (in_seq) content_ends[count - 1] = cpos;
        if (count >= cap) return -1;
        desc_starts[count] = pos + 1;
        desc_ends[count] = end;
      }
      count++;
      in_seq = true;
    } else if (in_seq && !counting) {
      for (int64_t i = pos; i < end; i++)
        if (buf[i] != ' ') content[cpos++] = buf[i];
    }
    pos = next;
  }
  if (in_seq && !counting) content_ends[count - 1] = cpos;
  return count;
}

// FASTQ: strict 4-line records. The header line is whitespace-trimmed on
// both ends and must then start with '@' (otherwise that line is
// skipped); the description is header[1:] with ' ' and '\r' removed
// (written transformed into `descs`); the content line is
// whitespace-trimmed on both ends; the '+' line, when present, consumes
// one quality line.
int64_t fastq_parse(const uint8_t *buf, int64_t n, uint8_t *content,
                    int64_t *content_ends, uint8_t *descs,
                    int64_t *desc_ends, int64_t cap) {
  const bool counting = content == nullptr;
  int64_t count = 0, cpos = 0, dpos = 0, pos = 0;
  while (pos < n) {
    int64_t next, end = line_end(buf, pos, n, &next);
    int64_t hs = pos, he = end;
    while (hs < he && is_space(buf[hs])) hs++;
    while (he > hs && is_space(buf[he - 1])) he--;
    pos = next;
    if (hs >= he || buf[hs] != '@') continue;  // skip this line only
    if (!counting && count >= cap) return -1;
    if (!counting) {
      for (int64_t i = hs + 1; i < he; i++)
        if (buf[i] != ' ' && buf[i] != '\r') descs[dpos++] = buf[i];
      desc_ends[count] = dpos;
    }

    // content line (possibly missing at EOF -> empty)
    int64_t cs = pos, ce = (pos < n) ? line_end(buf, pos, n, &next) : pos;
    if (pos < n) pos = next;
    if (!counting) {
      while (cs < ce && is_space(buf[cs])) cs++;
      while (ce > cs && is_space(buf[ce - 1])) ce--;
      for (int64_t i = cs; i < ce; i++) content[cpos++] = buf[i];
      content_ends[count] = cpos;
    }
    count++;

    // '+' separator line; when present, consume one quality line
    if (pos < n) {
      int64_t ps = pos;
      int64_t pe = line_end(buf, pos, n, &next);
      pos = next;
      if (ps < pe && buf[ps] == '+') {
        if (pos < n) {
          line_end(buf, pos, n, &next);
          pos = next;
        }
      } else {
        // python reads the '+' line unconditionally but only consumes a
        // quality line when it starts with '+': nothing to undo here
        // because the non-'+' line was already consumed as the "plus"
        // read in python too
      }
    }
  }
  return count;
}

}  // extern "C"
