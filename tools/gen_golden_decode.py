#!/usr/bin/env python3
"""Regenerate tests/golden/decode_*.npz from the reference C decode logic.

Ground-truth harness for the greedy decode heuristics: compiles the
reference's own `aas_process_logits` / `aas_emit_token` /
`aas_finalize_previous_words` / `aas_clear_context` (from
/root/reference/src/april_session.c:181-429) into a standalone binary with a
stubbed ONNXRuntime (the decode heuristics never read network outputs — the
only ORT call they reach is aas_run_decoder via aas_update_context, which the
stub turns into a no-op), then drives it with the same deterministic
table-driven logits the decode equivalence tests use
(tests/test_decode_equivalence.py: logits row = hash(frame, inner step,
decoder context)) and records the exact callback stream.

The fixtures are the reference's *compiled* behavior, not a transliteration:
tests/test_decode_golden.py asserts that both the ScalarDecoder oracle and
the batched device decode reproduce this stream call-for-call. Like the
fbank goldens (tools/gen_golden_fbank.py), the reference tree is used
strictly as a black-box oracle at fixture-generation time; nothing from it
is vendored into the repo (fixtures are gitignored, rebuilt on demand).

Harness protocol (stdin/stdout, little-endian):
  stdin : u32 V, u32 L, bytes V*L token arena, u32 blank_id,
          u32 K, f32 table[K*V], u32 n_frames, u32 do_finalize
  stdout: per handler call: u32 result_type, u32 count,
          then per token: u32 tok_idx, f32 logprob, u32 flags, u32 time_ms.
          A record with result_type 0xFFFF marks the start of the finalize
          tail (the _aas_flush epilogue, april_session.c:561-563).
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

REF = os.environ.get("APRIL_REFERENCE_DIR", "/root/reference")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

STRIDE_MS = 40  # fbank_get_segments_stride_ms for the canonical 4x10ms step

# Minimal fake of the ONNXRuntime C API: just enough type surface for
# april_session.c + ort_util.h to compile. The only member the decode path
# actually calls is Run (from aas_run_decoder), which the harness stubs to a
# no-op — decoder output never feeds back into the heuristics.
FAKE_ORT_H = r"""
#ifndef FAKE_ONNXRUNTIME_C_API_H
#define FAKE_ONNXRUNTIME_C_API_H
#include <stddef.h>
#include <stdint.h>

typedef struct OrtStatus OrtStatus;
typedef struct OrtMemoryInfo OrtMemoryInfo;
typedef struct OrtValue OrtValue;
typedef struct OrtSession OrtSession;
typedef struct OrtEnv OrtEnv;
typedef struct OrtSessionOptions OrtSessionOptions;
typedef struct OrtRunOptions OrtRunOptions;

typedef enum ONNXTensorElementDataType {
    ONNX_TENSOR_ELEMENT_DATA_TYPE_FLOAT = 1,
    ONNX_TENSOR_ELEMENT_DATA_TYPE_INT64 = 7
} ONNXTensorElementDataType;

typedef enum OrtAllocatorType { OrtArenaAllocator = 1 } OrtAllocatorType;
typedef enum OrtMemType { OrtMemTypeDefault = 0 } OrtMemType;

typedef struct OrtApi {
    OrtStatus *(*CreateCpuMemoryInfo)(OrtAllocatorType, OrtMemType,
                                      OrtMemoryInfo **);
    void (*ReleaseMemoryInfo)(OrtMemoryInfo *);
    OrtStatus *(*CreateTensorWithDataAsOrtValue)(
        const OrtMemoryInfo *, void *, size_t, const int64_t *, size_t,
        ONNXTensorElementDataType, OrtValue **);
    void (*ReleaseValue)(OrtValue *);
    OrtStatus *(*Run)(OrtSession *, const OrtRunOptions *,
                      const char *const *, const OrtValue *const *, size_t,
                      const char *const *, size_t, OrtValue **);
    const char *(*GetErrorMessage)(const OrtStatus *);
    void (*ReleaseStatus)(OrtStatus *);
    OrtStatus *(*CreateSessionFromArray)(const OrtEnv *, const void *, size_t,
                                         const OrtSessionOptions *,
                                         OrtSession **);
    OrtStatus *(*SessionGetInputCount)(const OrtSession *, size_t *);
    OrtStatus *(*SessionGetOutputCount)(const OrtSession *, size_t *);
} OrtApi;

#endif
"""

HARNESS_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include "onnxruntime_c_api.h"
#include "log.h"
#include "params.h"
#include "april_session.h"

LogLevel g_loglevel = LEVEL_ERROR;
int g_client_version = 1;

/* --- ORT stubs: decode heuristics only reach Run (as a no-op) --------- */
static OrtStatus *stub_cpu_meminfo(OrtAllocatorType a, OrtMemType m,
                                   OrtMemoryInfo **out) {
    (void)a; (void)m; *out = (OrtMemoryInfo *)1; return NULL;
}
static void stub_release_meminfo(OrtMemoryInfo *p) { (void)p; }
static OrtStatus *stub_create_tensor(const OrtMemoryInfo *mi, void *data,
                                     size_t len, const int64_t *shape,
                                     size_t nd, ONNXTensorElementDataType t,
                                     OrtValue **out) {
    (void)mi; (void)len; (void)shape; (void)nd; (void)t;
    *out = (OrtValue *)data; return NULL;
}
static void stub_release_value(OrtValue *v) { (void)v; }
static OrtStatus *stub_run(OrtSession *s, const OrtRunOptions *o,
                           const char *const *in_names,
                           const OrtValue *const *ins, size_t n_in,
                           const char *const *out_names, size_t n_out,
                           OrtValue **outs) {
    (void)s; (void)o; (void)in_names; (void)ins; (void)n_in;
    (void)out_names; (void)n_out; (void)outs; return NULL;
}
static const char *stub_errmsg(const OrtStatus *s) { (void)s; return "stub"; }
static void stub_release_status(OrtStatus *s) { (void)s; }
static OrtStatus *stub_create_session(const OrtEnv *e, const void *d, size_t n,
                                      const OrtSessionOptions *o,
                                      OrtSession **out) {
    (void)e; (void)d; (void)n; (void)o; *out = (OrtSession *)1; return NULL;
}
static OrtStatus *stub_count(const OrtSession *s, size_t *n) {
    (void)s; *n = 0; return NULL;
}

static const OrtApi g_fake_api = {
    stub_cpu_meminfo, stub_release_meminfo, stub_create_tensor,
    stub_release_value, stub_run, stub_errmsg, stub_release_status,
    stub_create_session, stub_count, stub_count,
};
const OrtApi *g_ort = &g_fake_api;

/* Non-static decode functions from april_session.c */
bool aas_process_logits(AprilASRSession aas, float early_emit);
void aas_update_context(AprilASRSession aas, int64_t new_token);
void aas_finalize_tokens(AprilASRSession aas);
void aas_clear_context(AprilASRSession aas);
void aas_emit_silence(AprilASRSession aas);

static ModelParameters *g_params;

static void record_handler(void *ud, AprilResultType result, size_t count,
                           const AprilToken *tokens) {
    (void)ud;
    uint32_t rt = (uint32_t)result, cnt = (uint32_t)count;
    fwrite(&rt, 4, 1, stdout);
    fwrite(&cnt, 4, 1, stdout);
    for (size_t i = 0; i < count; i++) {
        uint32_t idx = (uint32_t)((tokens[i].token - g_params->tokens) /
                                  g_params->token_length);
        float lp = tokens[i].logprob;
        uint32_t fl = (uint32_t)tokens[i].flags;
        uint32_t tm = (uint32_t)tokens[i].time_ms;
        fwrite(&idx, 4, 1, stdout);
        fwrite(&lp, 4, 1, stdout);
        fwrite(&fl, 4, 1, stdout);
        fwrite(&tm, 4, 1, stdout);
    }
}

static uint32_t read_u32(void) {
    uint32_t v;
    if (fread(&v, 4, 1, stdin) != 1) { fprintf(stderr, "bad stdin\n"); exit(1); }
    return v;
}

int main(void) {
    uint32_t V = read_u32(), L = read_u32();
    char *arena = malloc((size_t)V * L);
    if (fread(arena, 1, (size_t)V * L, stdin) != (size_t)V * L) return 1;
    uint32_t blank = read_u32();
    uint32_t K = read_u32();
    float *table = malloc((size_t)K * V * 4);
    if (fread(table, 4, (size_t)K * V, stdin) != (size_t)K * V) return 1;
    uint32_t n_frames = read_u32(), do_finalize = read_u32();

    struct AprilASRModel_i model;
    memset(&model, 0, sizeof(model));
    model.params.blank_id = (int)blank;
    model.params.token_count = (int)V;
    model.params.token_length = L;
    model.params.tokens = arena;
    g_params = &model.params;

    struct AprilASRSession_i aas;
    memset(&aas, 0, sizeof(aas));
    aas.model = &model;
    aas.context_size = 2;
    aas.context.data = calloc(2, sizeof(int64_t));
    aas.logits.data = malloc((size_t)V * 4);
    aas.handler = record_handler;
    aas.emitted_silence = true; /* april_session.c:64 */

    /* aas_infer lazy init (april_session.c:432-438) */
    for (size_t i = 0; i < aas.context_size; i++)
        aas_update_context(&aas, (int64_t)blank);
    aas.dout_init = true;

    for (uint32_t frame = 0; frame < n_frames; frame++) {
        aas.current_time_ms += 40; /* 4-frame hop x 10 ms */
        float early_emit = 2.0f;   /* april_session.c:449-453 */
        for (int i = 0; i < 3; i++) {
            early_emit -= 1.0f;
            uint64_t idx = ((uint64_t)frame * 31 + (uint64_t)i * 7 +
                            (uint64_t)aas.context.data[0] * 3 +
                            (uint64_t)aas.context.data[1]) % K;
            memcpy(aas.logits.data, table + idx * V, (size_t)V * 4);
            if (aas_process_logits(&aas, early_emit > 0.0f ? early_emit : 0.0f))
                break;
        }
    }

    if (do_finalize) {
        uint32_t marker = 0xFFFF, zero = 0;
        fwrite(&marker, 4, 1, stdout);
        fwrite(&zero, 4, 1, stdout);
        /* _aas_flush epilogue (april_session.c:561-563) */
        aas_finalize_tokens(&aas);
        aas_clear_context(&aas);
        aas_emit_silence(&aas);
    }
    fflush(stdout);
    return 0;
}
"""


def build_harness(tmp: str) -> str:
    with open(os.path.join(tmp, "onnxruntime_c_api.h"), "w") as f:
        f.write(FAKE_ORT_H)
    src = os.path.join(tmp, "harness.c")
    exe = os.path.join(tmp, "harness")
    with open(src, "w") as f:
        f.write(HARNESS_C)
    cmd = [
        "gcc", "-O2", "-o", exe, src,
        os.path.join(REF, "src", "april_session.c"),
        os.path.join(REF, "src", "fbank.c"),
        os.path.join(REF, "src", "fft", "pocketfft.c"),
        os.path.join(REF, "src", "sonic", "sonic.c"),
        os.path.join(REF, "src", "audio_provider.c"),
        os.path.join(REF, "src", "proc_thread.c"),
        os.path.join(REF, "src", "params.c"),
        "-I", tmp,  # fake onnxruntime_c_api.h shadows the (absent) real one
        "-I", os.path.join(REF, "src"),
        "-I", REF,  # april_api.h lives at the reference root
        "-lm", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return exe


def token_arena(tokens: list[bytes]) -> tuple[bytes, int]:
    """Fixed-stride arena layout matching params.c:85-109."""
    stride = max(len(t) for t in tokens) + 1
    return b"".join(t.ljust(stride, b"\0") for t in tokens), stride


def run_harness(
    exe: str,
    tokens: list[bytes],
    blank_id: int,
    table: np.ndarray,
    n_frames: int,
    do_finalize: bool,
) -> list[tuple[int, tuple]]:
    arena, stride = token_arena(tokens)
    K, V = table.shape
    assert V == len(tokens)
    payload = (
        struct.pack("<II", V, stride)
        + arena
        + struct.pack("<II", blank_id, K)
        + table.astype("<f4").tobytes()
        + struct.pack("<II", n_frames, int(do_finalize))
    )
    out = subprocess.run([exe], input=payload, capture_output=True, check=True)
    buf, off, calls = out.stdout, 0, []
    while off < len(buf):
        rt, cnt = struct.unpack_from("<II", buf, off)
        off += 8
        toks = []
        for _ in range(cnt):
            idx, lp, fl, tm = struct.unpack_from("<IfII", buf, off)
            off += 16
            toks.append((idx, lp, fl, tm))
        calls.append((rt, tuple(toks)))
    return calls


def calls_to_arrays(calls) -> dict[str, np.ndarray]:
    """Flatten the callback stream into parallel arrays for npz storage."""
    types, counts, tok, lp, fl, tm = [], [], [], [], [], []
    for rt, toks in calls:
        types.append(rt)
        counts.append(len(toks))
        for t in toks:
            tok.append(t[0]); lp.append(t[1]); fl.append(t[2]); tm.append(t[3])
    return {
        "call_types": np.asarray(types, np.uint32),
        "call_counts": np.asarray(counts, np.uint32),
        "tok": np.asarray(tok, np.uint32),
        "logprob": np.asarray(lp, np.float32),
        "flags": np.asarray(fl, np.uint32),
        "time_ms": np.asarray(tm, np.uint32),
    }


# (name, seed, spread, blank_boost, frames) — mirrors the scenario matrix of
# tests/test_decode_equivalence.py plus the window-overflow stress case.
CONFIGS = [
    ("mixed", 0, 3.0, 1.0, 120),
    ("blanky", 1, 2.0, 4.0, 200),
    ("emissive", 2, 5.0, -1.0, 150),
    ("borderline", 3, 1.0, 2.0, 300),
    ("overflow", 7, 6.0, -3.0, 400),
]

VOCAB = 64
BLANK = 0


def make_table(seed: int, spread: float, blank_boost: float) -> np.ndarray:
    rng = np.random.default_rng(seed)
    K = 97
    table = (rng.normal(size=(K, VOCAB)) * spread).astype(np.float32)
    table[:, BLANK] += blank_boost
    return table


def ensure_goldens(force: bool = False) -> None:
    paths = {
        name: os.path.join(GOLDEN_DIR, f"decode_{name}.npz") for name, *_ in CONFIGS
    }
    if not force and all(os.path.exists(p) for p in paths.values()):
        return
    if not os.path.isdir(os.path.join(REF, "src")):
        raise FileNotFoundError(f"reference tree not found at {REF}")
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    # import inside: package must be importable for default_tokens
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from april_asr_tpu.testing import default_tokens

    tokens = default_tokens(VOCAB, BLANK)
    with tempfile.TemporaryDirectory() as tmp:
        exe = build_harness(tmp)
        for name, seed, spread, boost, frames in CONFIGS:
            table = make_table(seed, spread, boost)
            calls = run_harness(exe, tokens, BLANK, table, frames, do_finalize=True)
            arrs = calls_to_arrays(calls)
            np.savez(
                paths[name],
                table=table,
                n_frames=np.uint32(frames),
                seed=np.uint32(seed),
                **arrs,
            )
            print(f"wrote {paths[name]}: {len(calls)} handler calls")


if __name__ == "__main__":
    ensure_goldens(force="--force" in sys.argv)
