/* Native host-IO fast path: record framing and 2-bit packing.
 *
 * The TPU-native counterpart of the reference's C input layer (mmap_file /
 * read_line / per-record parsing, normalise_kmers_multi_large.c:394-473).
 * Python drives mmap'd buffers through these two batch functions; the numpy
 * implementations in reader.py/pack.py remain as the portable fallback and
 * as the differential-testing oracle.
 *
 * Built as a plain shared object (no pybind11); bound via ctypes.
 */
#include <stdint.h>
#include <string.h>

/* byte -> 2-bit base code; N folds to A (replacestr N->A, nk.c:1406);
 * everything else = 255 (invalid => caller reports the reference's fatal
 * "does not appear to be a DNA sequence"). Built lazily by init_lut. */
static uint8_t lut_full[256];
static int lut_ready = 0;

static void init_lut(void) {
    if (lut_ready) return;
    for (int i = 0; i < 256; i++) lut_full[i] = 255;
    lut_full['A'] = 0; lut_full['C'] = 1; lut_full['G'] = 2; lut_full['T'] = 3;
    lut_full['N'] = 0;
    lut_ready = 1;
}

/* Frame up to max_records complete records starting at byte `start`.
 * cols layout per record: rec_start, rec_end, hdr_start, hdr_len, seq_start,
 * seq_len (absolute file offsets; matches io.reader.RecordColumns).
 * Returns the number of records framed; *next_start is the offset of the
 * first unframed byte. A final line without trailing newline counts as a
 * line (mmap zero-fill past EOF, read_line NUL stop, nk.c:394-409). */
long long fastx_frame(const uint8_t *data, long long size, long long start,
                      int lines_per_record, long long max_records,
                      long long *cols, long long *next_start) {
    long long n = 0;
    long long pos = start;
    while (n < max_records) {
        long long rec_start = pos;
        long long line_end[4];
        int li;
        long long p = pos;
        for (li = 0; li < lines_per_record; li++) {
            if (p >= size) break;
            const uint8_t *nl = memchr(data + p, '\n', (size_t)(size - p));
            if (nl) {
                line_end[li] = nl - data;
                p = line_end[li] + 1;
            } else {
                line_end[li] = size;  /* implicit final newline at EOF */
                p = size;
                li++;
                break;
            }
        }
        if (li < lines_per_record) break;  /* incomplete trailing record */
        long long *c = cols + n * 6;
        c[0] = rec_start;
        c[1] = (line_end[lines_per_record - 1] < size) ? line_end[lines_per_record - 1] + 1
                                                       : size;
        c[2] = rec_start;
        c[3] = line_end[0] - rec_start;
        c[4] = line_end[0] + 1;
        c[5] = line_end[1] - line_end[0] - 1;
        if (c[5] < 0) c[5] = 0;
        pos = c[1];
        n++;
        if (pos >= size) break;
    }
    *next_start = pos;
    return n;
}

/* Pack n sequences into a fixed-width base-code matrix.
 * bases: [n, pad] uint8 out (padding zeroed); lengths: [n] int32 out
 * (0 when shorter than min_len — the silent-drop rule, nk.c:1408).
 * Returns 0, or -(row+1) on the first non-ACGTN byte (reference fatal). */
long long fastx_pack(const uint8_t *data, long long data_size,
                     const long long *starts, const long long *lens,
                     long long n, long long pad, long long min_len,
                     uint8_t *bases, int *lengths) {
    init_lut();
    for (long long r = 0; r < n; r++) {
        long long len = lens[r];
        if (len > pad) len = pad;
        long long s = starts[r];
        if (s < 0 || s + len > data_size) len = 0;
        uint8_t *row = bases + r * pad;
        const uint8_t *src = data + s;
        long long i = 0;
        for (; i < len; i++) {
            uint8_t code = lut_full[src[i]];
            if (code == 255) return -(r + 1);
            row[i] = code;
        }
        memset(row + len, 0, (size_t)(pad - len));
        lengths[r] = (len >= min_len) ? (int)len : 0;
    }
    return 0;
}

/* Output assembly: copy kept records into a contiguous buffer, rewriting
 * N->A in the sequence line (the reference's in-buffer replacestr shows up
 * in its output, nk.c:1406). Returns bytes written, or -1 if out_cap too
 * small. fq->fa conversion stays in Python (cold path). */
long long fastx_emit(const uint8_t *data, const long long *cols,
                     const unsigned char *keep, long long nrec,
                     uint8_t *out, long long out_cap) {
    long long w = 0;
    for (long long r = 0; r < nrec; r++) {
        if (!keep[r]) continue;
        const long long *c = cols + r * 6;
        long long rec_start = c[0], rec_end = c[1];
        long long seq_start = c[4], seq_end = c[4] + c[5];
        long long total = rec_end - rec_start;
        if (w + total > out_cap) return -1;
        memcpy(out + w, data + rec_start, (size_t)(seq_start - rec_start));
        w += seq_start - rec_start;
        for (long long i = seq_start; i < seq_end; i++) {
            uint8_t b = data[i];
            out[w++] = (b == 'N') ? 'A' : b;
        }
        memcpy(out + w, data + seq_end, (size_t)(rec_end - seq_end));
        w += rec_end - seq_end;
    }
    return w;
}
