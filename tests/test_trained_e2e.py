"""Trained-model accuracy loop: overfit a tiny transducer, assert transcripts.

The reference's only end-to-end correctness evidence decodes real audio with
a real model and checks the words (bindings/java .../LibraryTest.java:35-86,
zoo.wav -> "ELEPHANT"/"COOL"). No real `.april` model is downloadable here
(zero egress), so the loop closes internally: `april-train` overfits a tiny
LSTM transducer on a tone-coded corpus (each word is a distinct pure tone —
trivially separable, so exact-transcript greedy decode is a fair ask), then
every execution path must produce the exact training transcripts:

  (a) native fast path (pattern-matched fused step),
  (b) the ONNX-interpreter fallback on the exported ONNX-form `.april`
      (also proves the exporter round-trips *trained* weights),
  (c) bf16 weights + Pallas kernels (interpret mode on CPU) — converts the
      "bf16 numerics unproven for accuracy" caveat (ops/lstm_pallas.py) into
      evidence that real margins survive reduced precision,

plus corpus WER == 0 through tools/wer_harness.py, and the batched offline
engine path (api.transcribe_files).
"""

import os
import sys

import numpy as np
import pytest

WORDS = {"ba": 280.0, "de": 640.0, "ko": 1100.0, "mu": 1700.0, "ri": 2400.0}
RATE = 16000


def _write_corpus(tmp_path, n=12, word_seconds=0.55):
    """n utterances of 2-3 tone-coded words with silence padding."""
    from april_asr_tpu.io.wav import write_wav

    rng = np.random.default_rng(7)
    keys = sorted(WORDS)
    lines = []
    for i in range(n):
        n_words = 2 + (i % 2)
        picks = [keys[(i * 3 + j * 2) % len(keys)] for j in range(n_words)]
        segs = [np.zeros(int(0.15 * RATE))]
        for w in picks:
            t = np.arange(int(word_seconds * RATE)) / RATE
            tone = 0.4 * np.sin(2 * np.pi * WORDS[w] * t)
            # fade in/out so word boundaries are acoustically clean
            ramp = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.05)
            segs.append(tone * ramp)
            segs.append(np.zeros(int(0.1 * RATE)))
        x = np.concatenate(segs)
        x = x + rng.normal(0, 0.004, x.shape)
        wav = tmp_path / f"utt{i}.wav"
        write_wav(str(wav), (np.clip(x, -1, 1) * 24000).astype(np.int16), RATE)
        lines.append(f"{wav}\t{' '.join(picks)}")
    manifest = tmp_path / "train.tsv"
    manifest.write_text("\n".join(lines) + "\n")
    return manifest, [ln.split("\t") for ln in lines]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train once for the whole module; returns paths + expected transcripts."""
    from april_asr_tpu.cli.train import main as train_main

    tmp_path = tmp_path_factory.mktemp("trained_e2e")
    manifest, pairs = _write_corpus(tmp_path)
    out_dir = tmp_path / "exp"
    native_april = tmp_path / "trained_native.april"
    rc = train_main([
        "--manifest", str(manifest), "--out-dir", str(out_dir),
        "--preset", "tiny", "--steps", "220", "--batch", "6",
        "--lr", "3e-3", "--warmup-steps", "20", "--ckpt-every", "0",
        "--export", str(native_april), "--export-form", "native",
    ])
    assert rc == 0

    # Second export in reference-compatible ONNX form from the final
    # checkpoint (the CLI exports once; reuse its persisted vocab + ckpt).
    import json

    from april_asr_tpu.cli.train import build_dims
    from april_asr_tpu.models.export import make_model_parameters, save_april
    from april_asr_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint_params,
    )
    from april_asr_tpu.train.tokenizer import PieceTokenizer

    with open(out_dir / "pieces.json") as f:
        pieces = [bytes.fromhex(h) for h in json.load(f)]
    tok = PieceTokenizer(pieces)
    dims = build_dims("tiny", "lstm", tok.vocab_size)
    params = load_checkpoint_params(latest_checkpoint(out_dir / "ckpt"))
    onnx_april = tmp_path / "trained_onnx.april"
    mp = make_model_parameters(dims, pieces, blank_id=tok.blank_id)
    save_april(
        str(onnx_april), dims,
        {k: np.asarray(v) for k, v in params.items()},
        mp, name="trained-e2e", form="onnx",
    )
    return {
        "native": str(native_april),
        "onnx": str(onnx_april),
        "manifest": str(manifest),
        "pairs": pairs,
    }


def _decode_all(model, pairs):
    from april_asr_tpu.api import Result, Session
    from april_asr_tpu.io.wav import read_wav

    hyps = []
    for wav, _ in pairs:
        samples, _ = read_wav(wav)
        finals, partial = [], [""]

        def handler(result, tokens):
            text = "".join(t.token for t in tokens)
            if result == Result.FINAL_RECOGNITION:
                finals.append(text)
            elif result == Result.PARTIAL_RECOGNITION:
                partial[0] = text

        sess = Session(model, handler)
        for off in range(0, len(samples), 3200):
            sess.feed_pcm16(samples[off : off + 3200].tobytes())
        sess.flush()
        sess.close()
        hyps.append((" ".join(finals) if finals else partial[0]).strip())
    return hyps


def test_native_fast_path_exact_transcripts(trained):
    from april_asr_tpu.api import Model

    model = Model(trained["native"], prefer_native=True)
    assert model.runtime.kind == "native"
    hyps = _decode_all(model, trained["pairs"])
    refs = [ref for _, ref in trained["pairs"]]
    assert hyps == refs, f"\nhyp: {hyps}\nref: {refs}"


def test_onnx_interpreter_fallback_exact_transcripts(trained):
    """Exported ONNX-form .april through the interpreter path — proves the
    exporter round-trips trained weights (reference extra/export-april.py
    parity) and the onnx2jax path decodes identically."""
    from april_asr_tpu.api import Model

    model = Model(trained["onnx"], prefer_native=False)
    assert model.runtime.kind != "native"
    hyps = _decode_all(model, trained["pairs"])
    refs = [ref for _, ref in trained["pairs"]]
    assert hyps == refs, f"\nhyp: {hyps}\nref: {refs}"


def test_bf16_pallas_exact_transcripts(trained):
    """bf16 weights + Pallas kernels (interpret mode on CPU): trained-margin
    numerics survive reduced precision end-to-end."""
    import jax.numpy as jnp

    from april_asr_tpu.api import Model
    from april_asr_tpu.models.lstm_transducer import cast_weights

    os.environ["APRIL_PALLAS"] = "1"
    try:
        model = Model(trained["native"], prefer_native=True)
        model.runtime.weights = cast_weights(model.runtime.weights, jnp.bfloat16)
        hyps = _decode_all(model, trained["pairs"])
    finally:
        del os.environ["APRIL_PALLAS"]
    refs = [ref for _, ref in trained["pairs"]]
    assert hyps == refs, f"\nhyp: {hyps}\nref: {refs}"


def test_int8_quantized_exact_transcripts(trained):
    """int8 quantized serving path (precision="int8"): per-channel weight
    quantization + dynamic per-row activation quantization through the
    encoder. Trained decision margins dwarf the <=1% quantization noise, so
    transcripts must be unchanged — the accuracy evidence behind making
    int8 the benchmark's serving configuration."""
    from april_asr_tpu.api import Model
    from april_asr_tpu.models.lstm_transducer import is_quantized

    model = Model(trained["native"], prefer_native=True, precision="int8")
    assert is_quantized(model.runtime.weights)
    hyps = _decode_all(model, trained["pairs"])
    refs = [ref for _, ref in trained["pairs"]]
    assert hyps == refs, f"\nhyp: {hyps}\nref: {refs}"


def test_wer_harness_zero(trained, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.wer_harness import main as wer_main

    rc = wer_main([trained["native"], trained["manifest"]])
    assert rc == 0
    out = capsys.readouterr().out
    assert "WER" in out or "wer" in out
    import re

    m = re.search(r"([0-9.]+)\s*%", out)
    assert m, f"no WER percentage in: {out}"
    assert float(m.group(1)) == 0.0, out


def test_batched_offline_engine_exact(trained):
    from april_asr_tpu.api import Model, transcribe_files

    model = Model(trained["native"])
    hyps = transcribe_files(model, [w for w, _ in trained["pairs"]], batch=4)
    refs = [ref for _, ref in trained["pairs"]]
    assert [h.strip() for h in hyps] == refs


def test_streaming_beam_matches_offline_beam(trained):
    """Streaming beam sessions (Session(beam=4)) must produce the exact
    training transcripts AND agree with the offline beam search — on an
    overfit model the two are word-identical despite the streaming path's
    flush padding (chaotic random-weight models would diverge at the tail,
    trained margins don't)."""
    import jax.numpy as jnp

    from april_asr_tpu.api import Model, Result, Session
    from april_asr_tpu.decode.beam import BeamConfig, beam_search
    from april_asr_tpu.frontend.oracle import logmel_frames
    from april_asr_tpu.io.wav import read_wav
    from april_asr_tpu.models.lstm_transducer import (
        encoder_seq,
        init_streaming_state,
    )

    model = Model(trained["native"])
    rt = model.runtime
    refs = [ref for _, ref in trained["pairs"]]

    hyps = []
    for wav, _ in trained["pairs"]:
        samples, _ = read_wav(wav)
        finals, partial = [], [""]

        def handler(result, tokens):
            text = "".join(t.token for t in tokens)
            if result == Result.FINAL_RECOGNITION:
                finals.append(text)
            elif result == Result.PARTIAL_RECOGNITION:
                partial[0] = text

        sess = Session(model, handler, beam=4)
        for off in range(0, len(samples), 3200):
            sess.feed_pcm16(samples[off : off + 3200].tobytes())
        sess.flush()
        sess.close()
        hyps.append((" ".join(finals) if finals else partial[0]).strip())
    assert hyps == refs, f"\nhyp: {hyps}\nref: {refs}"

    # offline beam on the first two utterances: same words
    for wav, ref in trained["pairs"][:2]:
        samples, _ = read_wav(wav)
        mel = logmel_frames(rt.fbank_opts, samples.astype(np.float32) / 32768.0)
        dims = rt.dims
        h, c = init_streaming_state(dims, 1)
        eouts, _, _ = encoder_seq(rt.weights, jnp.asarray(mel)[None], h, c, dims)
        toks, lens, _ = beam_search(
            rt.weights, eouts, jnp.ones((1, eouts.shape[1]), bool),
            rt.decoder_step, rt.joiner, dims.context, rt.blank_id,
            BeamConfig(beam=4),
        )
        text = "".join(
            rt.params.token_str(int(t)) for t in np.asarray(toks[0][: int(lens[0])])
        ).strip()
        assert text == ref, f"offline beam {text!r} != {ref!r}"


def test_conformer_trained_exact_transcripts(tmp_path_factory):
    """The Conformer family closes the same accuracy loop: april-train
    --arch conformer overfits the tone corpus and the serving engine decodes
    the exact training transcripts from the exported native .april
    (reference has no conformer; SURVEY.md stretch family)."""
    from april_asr_tpu.api import Model
    from april_asr_tpu.cli.train import main as train_main

    tmp_path = tmp_path_factory.mktemp("trained_conf")
    manifest, pairs = _write_corpus(tmp_path)
    april = tmp_path / "conf.april"
    rc = train_main([
        "--manifest", str(manifest), "--out-dir", str(tmp_path / "exp"),
        "--preset", "tiny", "--arch", "conformer", "--steps", "300",
        "--batch", "6", "--lr", "3e-3", "--warmup-steps", "20",
        "--ckpt-every", "0", "--export", str(april), "--export-form", "native",
    ])
    assert rc == 0
    model = Model(str(april))
    assert type(model.runtime.dims).__name__ == "ConformerDims"
    hyps = _decode_all(model, pairs)
    refs = [ref for _, ref in pairs]
    assert hyps == refs, f"\nhyp: {hyps}\nref: {refs}"

    # int8 quantized serving on the SAME trained conformer: per-channel
    # int8 projections through the attention blocks, exact transcripts
    from april_asr_tpu.models.lstm_transducer import quantize_weights

    model_q = Model(str(april), precision="int8")
    assert "att_q_q8" in model_q.runtime.weights
    hyps_q = _decode_all(model_q, pairs)
    assert hyps_q == refs, f"\nhyp: {hyps_q}\nref: {refs}"
