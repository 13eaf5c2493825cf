"""CLI transcription tool — equivalent of the reference `main` example
(reference: example.cpp:118-233): decode a wav file or stdin stream and print
partial/final results; `?` as the input feeds zeros for smoke/leak testing
(example.cpp:151-156).

Usage:
    april-transcribe <file.wav|-|?> <model.april> [--chunk N] [--quiet]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _beam_transcribe(args) -> int:
    """Offline beam-search decode of a wav file (framework extension; the
    reference has greedy only)."""
    import jax.numpy as jnp

    from ..api import Model
    from ..decode.beam import BeamConfig, beam_search
    from ..frontend.oracle import logmel_frames
    from ..io.wav import read_wav, resample_linear
    from ..models.lstm_transducer import encoder_seq, init_streaming_state

    if args.wav in ("-", "?"):
        print("error: --beam requires a wav file input", file=sys.stderr)
        return 1
    model = Model(args.model, precision=args.precision)
    rt = model.runtime
    if rt.kind != "native":
        print(
            "error: --beam requires a native-architecture model "
            "(this model runs via the generic ONNX interpreter)",
            file=sys.stderr,
        )
        return 1
    rate = model.get_sample_rate()
    samples, wav_rate = read_wav(args.wav)
    if wav_rate != rate:
        samples = resample_linear(samples, wav_rate, rate)
    wave = samples.astype(np.float32) / 32768.0
    mel = logmel_frames(rt.fbank_opts, wave)
    dims = rt.dims
    if mel.shape[0] < dims.segment_size:
        print("@")
        return 0
    h, c = init_streaming_state(dims, 1)
    eouts, _, _ = encoder_seq(rt.weights, jnp.asarray(mel)[None], h, c, dims)
    mask = jnp.ones((1, eouts.shape[1]), bool)
    toks, lens, score = beam_search(
        rt.weights,
        eouts,
        mask,
        rt.decoder_step,
        rt.joiner,
        dims.context,
        rt.blank_id,
        BeamConfig(beam=args.beam),
    )
    n = int(lens[0])
    text = "".join(rt.params.token_str(int(t)) for t in np.asarray(toks[0, :n]))
    print(f"# beam={args.beam} score={float(score[0]):.2f}", file=sys.stderr)
    print("@ " + text.strip())
    return 0


def _list_transcribe(args) -> int:
    """Bulk mode: decode every wav in a list file concurrently on the
    batched engine (api/offline.py) and print '<path>\\t<transcript>'."""
    from ..api import Model, transcribe_files

    paths = []
    with open(args.wav) as f:
        for line in f:
            line = line.strip()
            if line:
                paths.append(line.split("\t", 1)[0])
    if not paths:
        print("error: empty list file", file=sys.stderr)
        return 1
    model = Model(args.model, precision=args.precision)
    texts = transcribe_files(model, paths, batch=args.batch)
    for p, t in zip(paths, texts):
        print(f"{p}\t{t}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wav", help="wav path, '-' for raw PCM16 on stdin, '?' for zeros smoke test")
    ap.add_argument("model", help=".april model path")
    ap.add_argument("--chunk", type=int, default=3200, help="samples per feed")
    ap.add_argument("--quiet", action="store_true", help="only print final lines")
    ap.add_argument("--no-partials", action="store_true", help="don't overwrite-print partials")
    ap.add_argument(
        "--beam",
        type=int,
        default=0,
        help="offline beam-search decode with this beam width (wav input only; "
        "0 = streaming greedy, the reference behavior)",
    )
    ap.add_argument(
        "--streaming-beam",
        type=int,
        default=0,
        help="STREAMING beam search with this width: live PARTIAL callbacks "
        "report the best of K hypotheses (Session(beam=K)); works with "
        "wav/stdin/zeros inputs",
    )
    ap.add_argument(
        "--list", action="store_true",
        help="treat the input as a text file listing wav paths (one per "
        "line, optionally '<path>\\t...'); decodes them CONCURRENTLY on the "
        "batched engine and prints '<path>\\t<transcript>' lines",
    )
    ap.add_argument(
        "--batch", type=int, default=32,
        help="concurrent utterances per engine group in --list mode",
    )
    ap.add_argument(
        "--precision", default=None, choices=["f32", "bf16", "int8"],
        help="serving numerics (see april-serve --precision)",
    )
    args = ap.parse_args(argv)

    if args.list:
        return _list_transcribe(args)
    if args.beam > 0:
        return _beam_transcribe(args)

    from ..api import Model, Result, Session

    model = Model(args.model, precision=args.precision)
    rate = model.get_sample_rate()
    print(
        f"Model: {model.get_name()} [{model.get_language()}] @ {rate} Hz",
        file=sys.stderr,
    )

    line_state = {"last_len": 0}

    def print_partial(text: str):
        pad = max(0, line_state["last_len"] - len(text))
        sys.stdout.write("\r" + text + " " * pad)
        sys.stdout.flush()
        line_state["last_len"] = len(text)

    def handler(result: Result, tokens):
        text = "".join(t.token for t in tokens)
        if result == Result.FINAL_RECOGNITION:
            if not args.quiet and not args.no_partials:
                sys.stdout.write("\r")
            print("@ " + text.strip())
            line_state["last_len"] = 0
        elif result == Result.PARTIAL_RECOGNITION and not args.quiet and not args.no_partials:
            print_partial("- " + text.strip())
        elif result == Result.SILENCE and not args.quiet:
            pass

    session = (
        Session(model, handler, beam=args.streaming_beam)
        if args.streaming_beam >= 2
        else Session(model, handler)
    )

    if args.wav == "?":
        # zeros smoke test (example.cpp:151-156)
        session.feed_pcm16(np.zeros(args.chunk, np.int16).tobytes())
        session.flush()
    elif args.wav == "-":
        while True:
            data = sys.stdin.buffer.read(args.chunk * 2)
            if not data:
                break
            session.feed_pcm16(data)
        session.flush()
    else:
        from ..io.wav import read_wav, resample_linear

        samples, wav_rate = read_wav(args.wav)
        if wav_rate != rate:
            print(f"Resampling {wav_rate} -> {rate} Hz", file=sys.stderr)
            samples = resample_linear(samples, wav_rate, rate)
        for off in range(0, len(samples), args.chunk):
            session.feed_pcm16(samples[off : off + args.chunk].tobytes())
        session.flush()

    session.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
