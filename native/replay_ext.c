/* CPython extension: native replay of packed decode-event tensors.
 *
 * The device step returns one packed int32 tensor [S, P, 2*I + 1] per tick
 * (layout documented in april_asr_tpu/engine/step.py). Replaying it in
 * Python costs ~3.5 us per event (numpy scalar extraction + dataclass
 * construction) which makes the host — not the TPU — the serving
 * bottleneck at >20k events/step. This module does the scan, the token
 * window bookkeeping, and the callback dispatch in C; only the user's
 * handler runs as Python per result.
 *
 * Semantics mirror april_asr_tpu/engine/replay.py exactly (op application
 * order from decode/events.py: FIX_PREV_EOS, FINAL, RESET, APPEND, PARTIAL,
 * POP, SILENCE), which in turn reproduces the reference handler call order
 * inside aas_process_logits (reference src/april_session.c:199-429).
 *
 * Build: gcc -O2 -shared -fPIC -I<python-include> replay_ext.c -o _replay.so
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>

#include <stdint.h>
#include <string.h>

/* Op bits — april_asr_tpu/decode/events.py (values are part of the packed
 * tensor format; checked against the Python module in tests). */
#define OP_FIX_PREV_EOS 1
#define OP_FINAL 2
#define OP_RESET_TOKENS 4
#define OP_APPEND 8
#define OP_PARTIAL 16
#define OP_POP 32
#define OP_SILENCE 64

/* Result codes — april_asr_tpu/decode/scalar.py:25-28. */
#define RESULT_PARTIAL 1
#define RESULT_FINAL 2
#define RESULT_SILENCE 4

#define FLAG_SENTENCE_END 2

/* ------------------------------------------------------------------ */
/* Token: mutable C object duck-compatible with decode.scalar.ScalarToken */

typedef struct {
    PyObject_HEAD
    int token_id;
    double logprob;
    int flags;
    long time_ms;
} TokenObject;

static PyTypeObject Token_Type; /* fwd */

static TokenObject *token_alloc(int token_id, double logprob, int flags, long time_ms)
{
    TokenObject *t = PyObject_New(TokenObject, &Token_Type);
    if (!t) return NULL;
    t->token_id = token_id;
    t->logprob = logprob;
    t->flags = flags;
    t->time_ms = time_ms;
    return t;
}

static PyObject *Token_new(PyTypeObject *type, PyObject *args, PyObject *kwds)
{
    static char *kwlist[] = {"token_id", "logprob", "flags", "time_ms", NULL};
    int token_id = 0, flags = 0;
    double logprob = 0.0;
    long time_ms = 0;
    if (!PyArg_ParseTupleAndKeywords(args, kwds, "idil", kwlist, &token_id,
                                     &logprob, &flags, &time_ms))
        return NULL;
    return (PyObject *)token_alloc(token_id, logprob, flags, time_ms);
}

static PyObject *Token_copy(TokenObject *self, PyObject *Py_UNUSED(ignored))
{
    return (PyObject *)token_alloc(self->token_id, self->logprob, self->flags,
                                   self->time_ms);
}

static PyObject *Token_repr(TokenObject *self)
{
    PyObject *lp = PyFloat_FromDouble(self->logprob);
    if (!lp) return NULL;
    PyObject *r = PyUnicode_FromFormat(
        "ScalarToken(token_id=%d, logprob=%R, flags=%d, time_ms=%ld)",
        self->token_id, lp, self->flags, self->time_ms);
    Py_DECREF(lp);
    return r;
}

/* Field-wise equality against anything exposing the same attributes (the
 * pure-Python ScalarToken dataclass included). */
static PyObject *Token_richcompare(PyObject *a, PyObject *b, int op)
{
    if (op != Py_EQ && op != Py_NE) Py_RETURN_NOTIMPLEMENTED;
    if (!PyObject_HasAttrString(b, "token_id")) Py_RETURN_NOTIMPLEMENTED;
    TokenObject *t = (TokenObject *)a;
    int eq = 0;
    PyObject *tid = PyObject_GetAttrString(b, "token_id");
    PyObject *lp = PyObject_GetAttrString(b, "logprob");
    PyObject *fl = PyObject_GetAttrString(b, "flags");
    PyObject *tm = PyObject_GetAttrString(b, "time_ms");
    if (tid && lp && fl && tm) {
        eq = PyLong_AsLong(tid) == t->token_id &&
             PyFloat_AsDouble(lp) == t->logprob &&
             PyLong_AsLong(fl) == t->flags && PyLong_AsLong(tm) == t->time_ms;
        if (PyErr_Occurred()) { PyErr_Clear(); eq = 0; }
    }
    Py_XDECREF(tid); Py_XDECREF(lp); Py_XDECREF(fl); Py_XDECREF(tm);
    if (op == Py_NE) eq = !eq;
    if (eq) Py_RETURN_TRUE;
    Py_RETURN_FALSE;
}

static PyMemberDef Token_members[] = {
    {"token_id", T_INT, offsetof(TokenObject, token_id), 0, "vocabulary token id"},
    {"logprob", T_DOUBLE, offsetof(TokenObject, logprob), 0, "emission log-probability"},
    {"flags", T_INT, offsetof(TokenObject, flags), 0, "WORD_BOUNDARY/SENTENCE_END bits"},
    {"time_ms", T_LONG, offsetof(TokenObject, time_ms), 0, "emission time (ms of fed audio)"},
    {NULL},
};

static PyMethodDef Token_methods[] = {
    {"copy", (PyCFunction)Token_copy, METH_NOARGS, "field copy"},
    {NULL},
};

static PyTypeObject Token_Type = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "april_asr_tpu._replay.Token",
    .tp_basicsize = sizeof(TokenObject),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_new = Token_new,
    .tp_repr = (reprfunc)Token_repr,
    .tp_richcompare = Token_richcompare,
    .tp_members = Token_members,
    .tp_methods = Token_methods,
};

/* ------------------------------------------------------------------ */
/* shared per-cell application (dense tensor and compact blob replay) */

typedef struct {
    PyObject *res_partial, *res_final, *res_silence, *empty;
} ReplayCtx;

static int ctx_init(ReplayCtx *ctx)
{
    ctx->res_partial = PyLong_FromLong(RESULT_PARTIAL);
    ctx->res_final = PyLong_FromLong(RESULT_FINAL);
    ctx->res_silence = PyLong_FromLong(RESULT_SILENCE);
    ctx->empty = PyTuple_New(0);
    return (ctx->res_partial && ctx->res_final && ctx->res_silence && ctx->empty)
               ? 0
               : -1;
}

static void ctx_free(ReplayCtx *ctx)
{
    Py_XDECREF(ctx->res_partial);
    Py_XDECREF(ctx->res_final);
    Py_XDECREF(ctx->res_silence);
    Py_XDECREF(ctx->empty);
}

/* fetch slot s's replayer.tokens/on_result; 1 = got them, 0 = slot is None,
 * -1 = error */
static int slot_replayer(PyObject *slots, Py_ssize_t s, PyObject **toks,
                         PyObject **on_result)
{
    PyObject *slot = PySequence_GetItem(slots, s); /* new ref */
    if (!slot) return -1;
    if (slot == Py_None) { Py_DECREF(slot); return 0; }
    PyObject *replayer = PyObject_GetAttrString(slot, "replayer");
    Py_DECREF(slot);
    if (!replayer) return -1;
    *toks = PyObject_GetAttrString(replayer, "tokens");
    *on_result = PyObject_GetAttrString(replayer, "on_result");
    Py_DECREF(replayer);
    if (!*toks || !*on_result || !PyList_Check(*toks)) {
        Py_XDECREF(*toks);
        Py_XDECREF(*on_result);
        if (!PyErr_Occurred())
            PyErr_SetString(PyExc_TypeError, "replayer.tokens must be a list");
        return -1;
    }
    return 1;
}

/* apply one event cell; 0 ok, -1 failure (Python error set) */
static int apply_cell(PyObject *toks, PyObject *on_result, ReplayCtx *ctx,
                      int32_t w0, float logprob, long time_ms)
{
    int ops = w0 & 0x7F;
    int flags = (w0 >> 7) & 0x3;
    Py_ssize_t final_k = (w0 >> 9) & 0x7F;
    int tok = (w0 >> 16) & 0x3FFF;

    if (ops & OP_FIX_PREV_EOS) {
        Py_ssize_t len = PyList_GET_SIZE(toks);
        if (len > 0) {
            /* copy-on-write: callbacks may have captured the old object
             * (engine/replay.py:49-55) */
            PyObject *last = PyList_GET_ITEM(toks, len - 1);
            PyObject *tid = PyObject_GetAttrString(last, "token_id");
            PyObject *lp = PyObject_GetAttrString(last, "logprob");
            PyObject *fl = PyObject_GetAttrString(last, "flags");
            PyObject *tm = PyObject_GetAttrString(last, "time_ms");
            int failed = 0;
            if (tid && lp && fl && tm) {
                TokenObject *nt = token_alloc(
                    (int)PyLong_AsLong(tid), PyFloat_AsDouble(lp),
                    (int)(PyLong_AsLong(fl) | FLAG_SENTENCE_END),
                    PyLong_AsLong(tm));
                if (nt && !PyErr_Occurred())
                    PyList_SetItem(toks, len - 1, (PyObject *)nt);
                else { Py_XDECREF(nt); failed = 1; }
            } else
                failed = 1;
            Py_XDECREF(tid); Py_XDECREF(lp); Py_XDECREF(fl); Py_XDECREF(tm);
            if (failed) return -1;
        }
    }
    if (ops & OP_FINAL) {
        Py_ssize_t len = PyList_GET_SIZE(toks);
        if (final_k > len) final_k = len;
        PyObject *head = PyList_GetSlice(toks, 0, final_k);
        if (!head) return -1;
        PyObject *r = PyObject_CallFunctionObjArgs(on_result, ctx->res_final, head, NULL);
        Py_DECREF(head);
        if (!r) return -1;
        Py_DECREF(r);
        if (PyList_SetSlice(toks, 0, final_k, NULL) < 0) return -1;
    }
    if (ops & OP_RESET_TOKENS) {
        if (PyList_SetSlice(toks, 0, PyList_GET_SIZE(toks), NULL) < 0) return -1;
    }
    if (ops & OP_APPEND) {
        TokenObject *nt = token_alloc(tok, (double)logprob, flags, time_ms);
        if (!nt || PyList_Append(toks, (PyObject *)nt) < 0) { Py_XDECREF(nt); return -1; }
        Py_DECREF(nt);
    }
    if (ops & OP_PARTIAL) {
        PyObject *r = PyObject_CallFunctionObjArgs(on_result, ctx->res_partial, toks, NULL);
        if (!r) return -1;
        Py_DECREF(r);
    }
    if (ops & OP_POP) {
        Py_ssize_t len = PyList_GET_SIZE(toks);
        if (len > 0 && PyList_SetSlice(toks, len - 1, len, NULL) < 0) return -1;
    }
    if (ops & OP_SILENCE) {
        PyObject *r = PyObject_CallFunctionObjArgs(on_result, ctx->res_silence, ctx->empty, NULL);
        if (!r) return -1;
        Py_DECREF(r);
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* replay(buffer, S, P, I, slots) -> n_events */

static PyObject *replay(PyObject *Py_UNUSED(self), PyObject *args)
{
    Py_buffer view;
    Py_ssize_t S, P, I;
    PyObject *slots;
    if (!PyArg_ParseTuple(args, "y*nnnO", &view, &S, &P, &I, &slots))
        return NULL;
    Py_ssize_t width = 2 * I + 1;
    if (view.len < (Py_ssize_t)(S * P * width * sizeof(int32_t))) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "event buffer too small for S*P*(2I+1)");
        return NULL;
    }
    if (!PySequence_Check(slots)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "slots must be a sequence");
        return NULL;
    }

    const int32_t *base = (const int32_t *)view.buf;
    long n_events = 0;
    int failed = 0;

    ReplayCtx ctx;
    if (ctx_init(&ctx) < 0) failed = 1;

    for (Py_ssize_t s = 0; s < S && !failed; s++) {
        const int32_t *row0 = base + s * P * width;
        /* fast skip: most sessions emit nothing in a step */
        int any = 0;
        for (Py_ssize_t p = 0; p < P && !any; p++) {
            const int32_t *cell = row0 + p * width;
            for (Py_ssize_t j = 0; j < I; j++)
                if (cell[j] & 0x7F) { any = 1; break; }
        }
        if (!any) continue;

        PyObject *toks = NULL, *on_result = NULL;
        int got = slot_replayer(slots, s, &toks, &on_result);
        if (got < 0) { failed = 1; break; }
        if (got == 0) continue;

        for (Py_ssize_t p = 0; p < P && !failed; p++) {
            const int32_t *cell = row0 + p * width;
            long time_ms = cell[2 * I];
            for (Py_ssize_t j = 0; j < I && !failed; j++) {
                int32_t w0 = cell[j];
                if (!(w0 & 0x7F)) continue;
                n_events++;
                float logprob;
                memcpy(&logprob, &cell[I + j], sizeof(float));
                if (apply_cell(toks, on_result, &ctx, w0, logprob, time_ms) < 0)
                    failed = 1;
            }
        }
        Py_DECREF(toks);
        Py_DECREF(on_result);
    }

    ctx_free(&ctx);
    PyBuffer_Release(&view);
    if (failed) return NULL;
    return PyLong_FromLong(n_events);
}

/* ------------------------------------------------------------------ */
/* replay_blob(buffer, slots) -> n_events
 *
 * Replays ONE compact sub-blob (layout: april_asr_tpu/engine/step.py —
 * header [magic, S, K, stride], counts[S], base_time[S], word0[K], lp[K],
 * dt u8[K] packed 4/word). The caller has already verified sum(counts) <= K
 * (overflowed blobs are replayed from the dense tensor instead). */

static PyObject *replay_blob(PyObject *Py_UNUSED(self), PyObject *args)
{
    Py_buffer view;
    PyObject *slots;
    if (!PyArg_ParseTuple(args, "y*O", &view, &slots))
        return NULL;
    const int32_t *b = (const int32_t *)view.buf;
    Py_ssize_t n_ints = view.len / (Py_ssize_t)sizeof(int32_t);
    if (n_ints < 4 || b[0] != 0x41505234) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "bad event blob header");
        return NULL;
    }
    Py_ssize_t S = b[1], K = b[2];
    long stride = b[3];
    if (S < 0 || K < 0 || n_ints < 4 + 2 * S + 2 * K + (K + 3) / 4) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "event blob truncated");
        return NULL;
    }
    if (!PySequence_Check(slots)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "slots must be a sequence");
        return NULL;
    }
    const int32_t *counts = b + 4;
    const int32_t *base_time = b + 4 + S;
    const int32_t *w0 = b + 4 + 2 * S;
    const int32_t *lp = w0 + K;
    const uint8_t *dt = (const uint8_t *)(lp + K); /* little-endian pack */

    long n_events = 0;
    int failed = 0;
    ReplayCtx ctx;
    if (ctx_init(&ctx) < 0) failed = 1;

    Py_ssize_t k = 0;
    for (Py_ssize_t s = 0; s < S && !failed; s++) {
        Py_ssize_t c = counts[s];
        if (c <= 0) continue;
        if (k + c > K) {
            PyErr_SetString(PyExc_ValueError,
                            "event blob overflow (caller must use dense path)");
            failed = 1;
            break;
        }
        PyObject *toks = NULL, *on_result = NULL;
        int got = slot_replayer(slots, s, &toks, &on_result);
        if (got < 0) { failed = 1; break; }
        if (got == 0) { k += c; continue; }
        for (Py_ssize_t i = 0; i < c && !failed; i++, k++) {
            float logprob;
            memcpy(&logprob, &lp[k], sizeof(float));
            long time_ms = (long)base_time[s] + (long)dt[k] * stride;
            if (apply_cell(toks, on_result, &ctx, w0[k], logprob, time_ms) < 0)
                failed = 1;
            else
                n_events++;
        }
        Py_DECREF(toks);
        Py_DECREF(on_result);
    }

    ctx_free(&ctx);
    PyBuffer_Release(&view);
    if (failed) return NULL;
    return PyLong_FromLong(n_events);
}

static PyMethodDef module_methods[] = {
    {"replay", replay, METH_VARARGS,
     "replay(buf, S, P, I, slots) -> applied event count (dense tensor)"},
    {"replay_blob", replay_blob, METH_VARARGS,
     "replay_blob(buf, slots) -> applied event count (compact sub-blob)"},
    {NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_replay",
    "native packed-event replay (see april_asr_tpu/engine/replay.py)", -1,
    module_methods,
};

PyMODINIT_FUNC PyInit__replay(void)
{
    PyObject *m;
    if (PyType_Ready(&Token_Type) < 0) return NULL;
    m = PyModule_Create(&moduledef);
    if (!m) return NULL;
    Py_INCREF(&Token_Type);
    if (PyModule_AddObject(m, "Token", (PyObject *)&Token_Type) < 0) {
        Py_DECREF(&Token_Type);
        Py_DECREF(m);
        return NULL;
    }
    return m;
}
