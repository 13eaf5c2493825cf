"""End-to-end training pipeline: tokenizer, data batching, train CLI,
checkpoint resume, and serving the exported .april."""

import json
import os

import numpy as np
import pytest

from april_asr_tpu.train.tokenizer import PieceTokenizer, build_char_pieces


def test_tokenizer_roundtrip():
    texts = ["hello world", "the cat", "WORLD  hello"]
    pieces = build_char_pieces(texts)
    tok = PieceTokenizer(pieces)
    assert pieces[0] == b"<blk>" and tok.blank_id == 0
    for t in ["hello world", "the cat hello"]:
        ids = tok.encode(t)
        assert tok.blank_id not in ids
        assert tok.decode(ids) == t
    # word-initial pieces carry the leading space (WORD_BOUNDARY derivation)
    first = tok.pieces[tok.encode("hello world")[0]]
    assert first.startswith(b" ")


def test_tokenizer_table_pieces():
    # multi-byte pieces: longest match wins
    pieces = [b"<blk>", b"<unk>", b" th", b" t", b"h", b"e", b" cat"]
    tok = PieceTokenizer(pieces)
    assert tok.encode("the cat") == [2, 5, 6]
    assert tok.decode(tok.encode("the cat")) == "the cat"
    # unencodable char falls back to <unk>
    assert tok.unk_id in tok.encode("thé")


def _write_corpus(tmp_path, n=6, seconds=1.0, rate=16000):
    """Tone-coded words: each word is a distinct pure tone, so the task is
    learnable by a tiny model in a few dozen steps."""
    from april_asr_tpu.io.wav import write_wav

    words = {"aa": 300.0, "bb": 700.0, "cc": 1500.0}
    rng = np.random.default_rng(0)
    lines = []
    keys = sorted(words)
    for i in range(n):
        picks = [keys[(i + j) % len(keys)] for j in range(2)]
        segs = []
        for w in picks:
            t = np.arange(int(seconds * rate / 2)) / rate
            segs.append(0.4 * np.sin(2 * np.pi * words[w] * t))
        x = np.concatenate(segs) + rng.normal(0, 0.01, int(seconds * rate))
        wav = tmp_path / f"utt{i}.wav"
        write_wav(str(wav), (np.clip(x, -1, 1) * 24000).astype(np.int16), rate)
        lines.append(f"utt{i}.wav\t{' '.join(picks)}")
    manifest = tmp_path / "train.tsv"
    manifest.write_text("\n".join(lines) + "\n")
    return manifest


def test_train_cli_end_to_end(tmp_path, capsys):
    from april_asr_tpu.cli.train import main

    manifest = _write_corpus(tmp_path)
    out_dir = tmp_path / "exp"
    april = tmp_path / "trained.april"
    rc = main([
        "--manifest", str(manifest), "--out-dir", str(out_dir),
        "--preset", "tiny", "--steps", "30", "--batch", "4",
        "--lr", "3e-3", "--warmup-steps", "5", "--ckpt-every", "15",
        "--export", str(april), "--val-manifest", str(manifest),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    losses = [
        float(line.split("loss ")[1].split(" ")[0])
        for line in out.splitlines()
        if line.startswith("step ")
    ]
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert april.exists()

    # the exported model serves through the public API
    from april_asr_tpu.api import Model, Session

    m = Model(str(april))
    calls = []
    s = Session(m, lambda r, toks: calls.append((r, toks)))
    wave, rate = __import__("april_asr_tpu.io.wav", fromlist=["read_wav"]).read_wav(
        str(tmp_path / "utt0.wav")
    )
    s.feed_pcm16(wave.tobytes())
    s.flush()
    assert len(calls) > 0


def test_checkpoint_resume(tmp_path):
    import jax
    import numpy as np

    from april_asr_tpu.models import TransducerDims, init_transducer_params
    from april_asr_tpu.train import make_train_step
    from april_asr_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    dims = TransducerDims(
        mel=80, segment_size=9, segment_step=4, d_model=16, hidden=24, ffn=32,
        joiner_dim=16, vocab=16, layers=1, decoder_groups=4,
        conv_channels=(2, 4, 4),
    )
    init_fn, step_fn = make_train_step(dims, blank_id=0)
    params = init_transducer_params(jax.random.PRNGKey(0), dims)
    state = init_fn(params)

    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.normal(size=(2, 13, dims.mel)).astype(np.float32),
        "labels": rng.integers(1, dims.vocab, size=(2, 3)).astype(np.int32),
        "frame_lens": np.full(2, 2, np.int32),
        "label_lens": np.full(2, 3, np.int32),
    }
    step = jax.jit(step_fn)
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    ckpt = tmp_path / "00000002.ckpt.safetensors"
    save_checkpoint(ckpt, state)
    assert latest_checkpoint(tmp_path) == str(ckpt)

    restored = load_checkpoint(ckpt, init_fn(params))
    assert int(restored.step) == 2
    # continuing from the restored state matches continuing from the original
    a, loss_a = step(state, batch)
    b, loss_b = step(restored, batch)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.params["join_t"]), np.asarray(b.params["join_t"]), atol=1e-6
    )


def test_train_cli_conformer(tmp_path, capsys):
    """Conformer family trains through the same CLI and serves the export."""
    from april_asr_tpu.cli.train import main

    manifest = _write_corpus(tmp_path, n=4)
    april = tmp_path / "conf_trained.april"
    rc = main([
        "--manifest", str(manifest), "--out-dir", str(tmp_path / "exp_conf"),
        "--preset", "tiny", "--arch", "conformer", "--steps", "12",
        "--batch", "4", "--lr", "3e-3", "--warmup-steps", "4",
        "--ckpt-every", "0", "--export", str(april),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    losses = [
        float(line.split("loss ")[1].split(" ")[0])
        for line in out.splitlines()
        if line.startswith("step ")
    ]
    assert losses[-1] < losses[0] * 1.5  # training runs and is stable

    from april_asr_tpu.api import Model

    m = Model(str(april))
    assert type(m.runtime.dims).__name__ == "ConformerDims"


def test_train_cli_empty_manifest(tmp_path):
    from april_asr_tpu.cli.train import main

    manifest = tmp_path / "empty.tsv"
    manifest.write_text("")
    rc = main([
        "--manifest", str(manifest), "--out-dir", str(tmp_path / "exp"),
        "--preset", "tiny", "--steps", "5",
    ])
    assert rc == 1
