"""SubRip (.srt) subtitle generator — equivalent of the reference `srt`
example (reference: example_srt.cpp:57-199): decodes a wav and emits numbered
subtitle entries with timestamps from token time_ms.

Usage:
    april-srt <file.wav> <model.april> [-o out.srt] [--max-gap-ms N]
"""

from __future__ import annotations

import argparse
import sys


def _ts(ms: int) -> str:
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, ms2 = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms2:03d}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("wav")
    ap.add_argument("model")
    ap.add_argument("-o", "--output", default=None, help="output path (default stdout)")
    ap.add_argument(
        "--tail-ms", type=int, default=700,
        help="display tail added after the last token of an entry",
    )
    args = ap.parse_args(argv)

    from ..api import Model, Result, Session
    from ..io.wav import read_wav, resample_linear

    model = Model(args.model)
    rate = model.get_sample_rate()
    samples, wav_rate = read_wav(args.wav)
    if wav_rate != rate:
        samples = resample_linear(samples, wav_rate, rate)

    entries = []

    def handler(result: Result, tokens):
        if result != Result.FINAL_RECOGNITION or not tokens:
            return
        text = "".join(t.token for t in tokens).strip()
        if not text:
            return
        start_ms = tokens[0].time_ms
        end_ms = tokens[-1].time_ms + args.tail_ms
        entries.append((start_ms, end_ms, text))

    session = Session(model, handler)
    for off in range(0, len(samples), 3200):
        session.feed_pcm16(samples[off : off + 3200].tobytes())
    session.flush()
    session.close()

    out = sys.stdout if args.output is None else open(args.output, "w")
    try:
        for i, (start, end, text) in enumerate(entries, 1):
            out.write(f"{i}\n{_ts(start)} --> {_ts(end)}\n{text}\n\n")
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
