/* CLI example on the C ABI — the framework's counterpart of the reference's
 * example.cpp (reference: example.cpp:1-233; rewritten for the TCP-client
 * design: argument 2 is an april-serve endpoint, not a model file).
 *
 * Usage:
 *   ./main <file.wav> <host:port>   decode a 16 kHz mono PCM16 wav
 *   ./main -          <host:port>   stream raw PCM16 from stdin
 *   ./main ?          <host:port>   feed zeros (smoke/leak mode, mirrors
 *                                   example.cpp:151-156)
 *
 * Build (see tools/ci.sh):
 *   gcc -O2 main.c -I../../native -lapril_tpu -o main
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#include "april_tpu_api.h"

static void print_tokens(size_t count, const AprilToken *tokens) {
    for (size_t i = 0; i < count; i++) fputs(tokens[i].token, stdout);
}

static void handler(void *ud, AprilResultType result, size_t count,
                    const AprilToken *tokens) {
    (void)ud;
    switch (result) {
    case APRIL_RESULT_RECOGNITION_PARTIAL:
        fputs("- ", stdout);
        print_tokens(count, tokens);
        fputs("\r\n", stdout);
        break;
    case APRIL_RESULT_RECOGNITION_FINAL:
        fputs("@ ", stdout);
        print_tokens(count, tokens);
        fputs("\n", stdout);
        break;
    case APRIL_RESULT_SILENCE:
        break;
    case APRIL_RESULT_ERROR_CANT_KEEP_UP:
        fputs("< cant keep up >\n", stdout);
        break;
    default:
        break;
    }
    fflush(stdout);
}

/* Minimal RIFF/WAVE reader: 16-bit mono PCM only. Returns sample count,
 * mallocs *out. */
static long read_wav(const char *path, short **out) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    unsigned char hdr[12];
    if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
        memcmp(hdr + 8, "WAVE", 4)) {
        fclose(f);
        return -1;
    }
    unsigned rate = 0;
    unsigned short channels = 0, bits = 0;
    long n = -1;
    for (;;) {
        unsigned char ch[8];
        if (fread(ch, 1, 8, f) != 8) break;
        unsigned size = ch[4] | (ch[5] << 8) | ((unsigned)ch[6] << 16) |
                        ((unsigned)ch[7] << 24);
        if (!memcmp(ch, "fmt ", 4)) {
            unsigned char fmt[16];
            if (size < 16 || fread(fmt, 1, 16, f) != 16) break;
            channels = fmt[2] | (fmt[3] << 8);
            rate = fmt[4] | (fmt[5] << 8) | ((unsigned)fmt[6] << 16) |
                   ((unsigned)fmt[7] << 24);
            bits = fmt[14] | (fmt[15] << 8);
            if (size > 16) fseek(f, size - 16, SEEK_CUR);
        } else if (!memcmp(ch, "data", 4)) {
            if (channels != 1 || bits != 16) {
                fprintf(stderr, "only 16-bit mono wav supported\n");
                break;
            }
            if (rate != 16000)
                fprintf(stderr, "warning: wav rate %u != 16000\n", rate);
            *out = (short *)malloc(size);
            if (fread(*out, 1, size, f) != size) {
                free(*out);
                break;
            }
            n = (long)(size / 2);
            break;
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
    }
    fclose(f);
    return n;
}

#define CHUNK 3200 /* 200 ms at 16 kHz, the reference cadence */

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s <file.wav | - | ?> <host:port>\n", argv[0]);
        return 1;
    }

    aam_api_init(APRIL_VERSION);
    AprilASRModel model = aam_create_model(argv[2]);
    if (!model) {
        fprintf(stderr, "failed to connect to %s\n", argv[2]);
        return 1;
    }
    fprintf(stderr, "Model: %s [%s] %zu Hz\n", aam_get_name(model),
            aam_get_language(model), aam_get_sample_rate(model));

    AprilConfig cfg;
    memset(&cfg, 0, sizeof(cfg));
    cfg.handler = handler;
    AprilASRSession session = aas_create_session(model, cfg);
    if (!session) {
        fprintf(stderr, "failed to create session\n");
        aam_free(model);
        return 1;
    }

    short buf[CHUNK];
    if (!strcmp(argv[1], "?")) {
        memset(buf, 0, sizeof(buf));
        aas_feed_pcm16(session, buf, CHUNK);
    } else if (!strcmp(argv[1], "-")) {
        size_t n;
        while ((n = fread(buf, 2, CHUNK, stdin)) > 0)
            aas_feed_pcm16(session, buf, n);
    } else {
        short *samples = NULL;
        long n = read_wav(argv[1], &samples);
        if (n < 0) {
            fprintf(stderr, "could not read %s\n", argv[1]);
            aas_free(session);
            aam_free(model);
            return 1;
        }
        for (long off = 0; off < n; off += CHUNK) {
            long take = n - off < CHUNK ? n - off : CHUNK;
            aas_feed_pcm16(session, samples + off, (size_t)take);
        }
        free(samples);
    }
    aas_flush(session);
    sleep(1); /* async handler drains on the reader thread */
    aas_free(session);
    aam_free(model);
    return 0;
}
