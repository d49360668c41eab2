// FASTQ/line-format parsing and read-line writing (host IO fast path).
//
// Fills the readsset iterator role (readsset/iterator/ReadsSetIterator.cpp:
// 45-243) for constant-length reads: one pass over the whole buffer,
// emitting 2 matrices [n_reads, read_len]: symbol value codes (ACGTN ->
// 0..4, anything else -> 4) and raw quality bytes.
#include <cstdint>
#include <cstring>

namespace {

inline const uint8_t *find_nl(const uint8_t *p, const uint8_t *end) {
    return static_cast<const uint8_t *>(memchr(p, '\n', end - p));
}

struct Sym2Val {
    uint8_t t[256];
    Sym2Val() {
        memset(t, 4, sizeof(t));
        t['A'] = t['a'] = 0;
        t['C'] = t['c'] = 1;
        t['G'] = t['g'] = 2;
        t['T'] = t['t'] = 3;
    }
};
const Sym2Val SYM2VAL;

const uint8_t VAL2SYM[5] = {'A', 'C', 'G', 'T', 'N'};

}  // namespace

extern "C" {

// Parse FASTQ. Returns number of reads parsed, or a negative error:
// -1 malformed record, -2 read length mismatch (variable-length input),
// -3 more reads than max_reads.
// read_len: in/out — pass 0 to autodetect from the first record.
int64_t fastq_parse(const uint8_t *buf, int64_t n, int64_t max_reads,
                    int64_t *read_len_io, uint8_t *codes, uint8_t *quality) {
    const uint8_t *p = buf;
    const uint8_t *end = buf + n;
    int64_t L = *read_len_io;
    int64_t count = 0;
    while (p < end) {
        if (*p != '@') return -1;
        const uint8_t *nl = find_nl(p, end);
        if (!nl) return -1;
        p = nl + 1;                              // sequence line
        nl = find_nl(p, end);
        if (!nl) return -1;
        const int64_t len = nl - p;
        if (L == 0) L = len;
        else if (len != L) return -2;
        if (count >= max_reads) return -3;
        uint8_t *crow = codes + count * L;
        for (int64_t i = 0; i < len; i++) crow[i] = SYM2VAL.t[p[i]];
        p = nl + 1;                              // '+' line
        nl = find_nl(p, end);
        if (!nl || *p != '+') return -1;
        p = nl + 1;                              // quality line
        nl = find_nl(p, end);
        const uint8_t *qend = nl ? nl : end;
        if (qend - p != L) return -1;
        memcpy(quality + count * L, p, L);
        p = nl ? nl + 1 : end;
        count++;
    }
    *read_len_io = L;
    return count;
}

// Parse one-read-per-line input (also used for FASTA sequence lines
// pre-filtered by the caller). Same return conventions as fastq_parse.
int64_t lines_parse(const uint8_t *buf, int64_t n, int64_t max_reads,
                    int64_t *read_len_io, uint8_t *codes) {
    const uint8_t *p = buf;
    const uint8_t *end = buf + n;
    int64_t L = *read_len_io;
    int64_t count = 0;
    while (p < end) {
        const uint8_t *nl = find_nl(p, end);
        const uint8_t *e = nl ? nl : end;
        const int64_t len = e - p;
        if (len == 0) { p = e + 1; continue; }
        if (L == 0) L = len;
        else if (len != L) return -2;
        if (count >= max_reads) return -3;
        uint8_t *crow = codes + count * L;
        for (int64_t i = 0; i < len; i++) crow[i] = SYM2VAL.t[p[i]];
        p = nl ? nl + 1 : end;
        count++;
    }
    *read_len_io = L;
    return count;
}

// codes [n, L] -> ASCII read lines with trailing '\n' into out [n*(L+1)].
void reads_write_lines(const uint8_t *codes, int64_t n, int64_t L, uint8_t *out) {
    for (int64_t r = 0; r < n; r++) {
        const uint8_t *src = codes + r * L;
        uint8_t *dst = out + r * (L + 1);
        for (int64_t i = 0; i < L; i++) dst[i] = VAL2SYM[src[i] > 4 ? 4 : src[i]];
        dst[L] = '\n';
    }
}

}  // extern "C"
