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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wav", help="wav path, '-' for raw PCM16 on stdin, '?' for zeros smoke test")
    ap.add_argument("model", help=".april model path")
    ap.add_argument("--chunk", type=int, default=3200, help="samples per feed")
    ap.add_argument("--quiet", action="store_true", help="only print final lines")
    ap.add_argument("--no-partials", action="store_true", help="don't overwrite-print partials")
    args = ap.parse_args(argv)

    from ..api import Model, Result, Session

    model = Model(args.model)
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

    session = Session(model, handler)

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
