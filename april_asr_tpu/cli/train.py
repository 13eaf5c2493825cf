"""Training CLI: manifest of wavs -> trained native transducer -> .april.

Closes the loop the reference leaves to icefall (extra/export-april.py
consumes an externally-trained checkpoint; exporting-howto.md tells users to
go train elsewhere): here the same framework trains the model — RNN-T loss,
DP x TP over a device mesh — checkpoints it, and exports a `.april` the
serving engine (and the reference library, via --form onnx) can load.

Usage:
    april-train --manifest train.tsv --out-dir exp [--val-manifest val.tsv]
                [--preset tiny|flagship] [--steps N] [--batch B] [--lr LR]
                [--model-parallel M] [--resume] [--export out.april]

Manifest lines: `wav_path<TAB>transcript`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def build_dims(preset: str, arch: str, vocab: int):
    from ..models import TransducerDims
    from ..models.conformer import ConformerDims

    if arch == "conformer":
        if preset == "flagship":
            return ConformerDims(vocab=vocab)
        return ConformerDims(
            d_model=64, heads=2, ffn=128, conv_kernel=4, att_context=16,
            joiner_dim=64, vocab=vocab, layers=2, decoder_groups=16,
            conv_channels=(4, 8, 8),
        )
    if preset == "flagship":
        return TransducerDims(vocab=vocab)
    if preset == "tiny":
        return TransducerDims(
            d_model=64, hidden=96, ffn=128, joiner_dim=64, vocab=vocab,
            layers=2, decoder_groups=16, conv_channels=(4, 8, 8),
        )
    raise ValueError(f"unknown preset {preset!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--val-manifest", default=None)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--preset", choices=["tiny", "flagship"], default="flagship")
    ap.add_argument(
        "--arch", choices=["lstm", "conformer"], default="lstm",
        help="model family (conformer exports require --export-form native)",
    )
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup-steps", type=int, default=100)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--ckpt-every", type=int, default=200)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--export", default=None, help="write a .april here at the end")
    ap.add_argument("--export-form", choices=["native", "onnx"], default="native")
    ap.add_argument("--name", default="april-tpu trained model")
    ap.add_argument("--language", default="en-us")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    import optax

    from ..config import FbankOptions
    from ..models import TransducerDims, init_transducer_params
    from ..models.conformer import init_conformer_params
    from ..models.export import make_model_parameters, save_april
    from ..parallel import make_mesh, shard_batch, shard_params
    from ..train import make_train_step
    from ..train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
    from ..train.data import featurize, make_batches, read_manifest
    from ..train.tokenizer import PieceTokenizer, build_char_pieces

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.out_dir, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)

    # -- vocabulary: persist with the experiment so resume/export agree
    vocab_path = os.path.join(args.out_dir, "pieces.json")
    examples = read_manifest(args.manifest)
    if os.path.exists(vocab_path):
        with open(vocab_path) as f:
            pieces = [bytes.fromhex(h) for h in json.load(f)]
    else:
        pieces = build_char_pieces(ex.text for ex in examples)
        with open(vocab_path, "w") as f:
            json.dump([p.hex() for p in pieces], f)
    tok = PieceTokenizer(pieces)
    print(f"vocab: {tok.vocab_size} pieces")

    dims = build_dims(args.preset, args.arch, tok.vocab_size)
    opts = FbankOptions(num_bins=dims.mel)
    examples = featurize(examples, opts, tok)
    print(f"train set: {len(examples)} utterances")
    if not examples:
        print(
            "error: no usable training utterances (all clips shorter than one "
            "encoder window, or empty transcripts)",
            file=sys.stderr,
        )
        return 1
    val = None
    if args.val_manifest:
        val = featurize(read_manifest(args.val_manifest), opts, tok)
        print(f"val set: {len(val)} utterances")

    # use the largest device grid whose data axis divides the batch
    import math

    n_dev = len(jax.devices())
    mp = args.model_parallel
    data = math.gcd(args.batch, max(n_dev // mp, 1))
    mesh = make_mesh(model_parallel=mp, devices=jax.devices()[: data * mp])
    print(f"mesh: data={data} model={mp} ({data * mp}/{n_dev} devices)")
    sched = optax.linear_schedule(0.0, args.lr, max(args.warmup_steps, 1))
    optimizer = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(
            optax.join_schedules(
                [sched, optax.constant_schedule(args.lr)], [args.warmup_steps]
            )
        ),
    )
    # mesh passed through: data-parallel-only meshes get the explicit
    # single-collective shard_map step (see make_train_step docstring)
    init_fn, step_fn = make_train_step(
        dims, blank_id=tok.blank_id, optimizer=optimizer, mesh=mesh
    )

    init_params = (init_conformer_params if args.arch == "conformer" else init_transducer_params)
    params = init_params(jax.random.PRNGKey(args.seed), dims)
    params = shard_params(params, mesh)
    state = init_fn(params)
    if args.resume:
        path = latest_checkpoint(ckpt_dir)
        if path:
            state = load_checkpoint(path, state)
            state = state._replace(params=shard_params(state.params, mesh))
            print(f"resumed from {path} at step {int(state.step)}")

    step_jit = jax.jit(step_fn, donate_argnums=(0,))
    eval_loss = None
    if val:
        from ..train import transducer_loss_fn

        eval_loss = jax.jit(transducer_loss_fn(dims, tok.blank_id))

    def save(state):
        path = os.path.join(ckpt_dir, f"{int(state.step):08d}.ckpt.safetensors")
        save_checkpoint(path, state)
        print(f"checkpoint: {path}")

    t0 = time.time()
    done = int(state.step)
    epoch = 0
    while done < args.steps:
        for batch in make_batches(
            examples, args.batch, dims.segment_size, dims.segment_step,
            tok.blank_id, seed=args.seed + epoch,
        ):
            batch = {k: shard_batch(v, mesh) for k, v in batch.items()}
            state, loss = step_jit(state, batch)
            done = int(state.step)
            if done % 10 == 0 or done == args.steps:
                dt = time.time() - t0
                print(f"step {done}/{args.steps} loss {float(loss):.4f} ({dt:.1f}s)")
            if args.ckpt_every and done % args.ckpt_every == 0:
                save(state)
            if done >= args.steps:
                break
        epoch += 1

    save(state)
    if eval_loss is not None:
        losses = []
        for batch in make_batches(
            val, args.batch, dims.segment_size, dims.segment_step,
            tok.blank_id, seed=0,
        ):
            batch = {k: shard_batch(v, mesh) for k, v in batch.items()}
            losses.append(float(eval_loss(state.params, batch)))
        print(f"val loss: {np.mean(losses):.4f} over {len(losses)} batches")

    if args.export:
        mp = make_model_parameters(dims, pieces, blank_id=tok.blank_id)
        save_april(
            args.export, dims,
            {k: np.asarray(v) for k, v in state.params.items()},
            mp, name=args.name,
            description=f"Trained by april-train ({args.preset}, "
            f"step {int(state.step)})",
            language=args.language, form=args.export_form,
        )
        print(f"exported: {args.export}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
