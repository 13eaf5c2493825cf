#!/usr/bin/env python
"""WER harness: score a model against a transcript manifest.

Usage:
    python tools/wer_harness.py MODEL.april MANIFEST [--beam K] [--limit N]

MANIFEST is a text file with one `<wav-path>\t<reference transcript>` pair
per line (LibriSpeech-style manifests are produced by standard kaldi/lhotse
tooling; this repo ships no audio data). Each wav is decoded with the
streaming session (or offline beam search with --beam) and corpus WER is
reported — the accuracy counterpart of bench.py's throughput number
(north-star: WER parity with the reference icefall LSTM transducer on
LibriSpeech test-clean, BASELINE.md).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model")
    ap.add_argument("manifest")
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument(
        "--engine-batch", type=int, default=0,
        help="decode N utterances concurrently on the batched engine "
        "(api.transcribe_files; greedy only) instead of one at a time",
    )
    args = ap.parse_args(argv)

    from april_asr_tpu.api import Model, Result, Session
    from april_asr_tpu.io.wav import read_wav, resample_linear
    from april_asr_tpu.utils.wer import WerAccumulator

    model = Model(args.model)
    rate = model.get_sample_rate()
    acc = WerAccumulator()

    pairs = []
    with open(args.manifest) as f:
        for line in f:
            line = line.strip()
            if not line or "\t" not in line:
                continue
            wav, ref = line.split("\t", 1)
            pairs.append((wav, ref))
    if args.limit:
        pairs = pairs[: args.limit]

    if args.engine_batch > 0 and args.beam == 0:
        from april_asr_tpu.api import transcribe_files

        hyps = transcribe_files(
            model, [w for w, _ in pairs], batch=args.engine_batch
        )
        for (wav, ref), hyp in zip(pairs, hyps):
            acc.add(ref, hyp)
        print(acc.summary())
        return 0

    for i, (wav, ref) in enumerate(pairs):
        samples, wav_rate = read_wav(wav)
        if wav_rate != rate:
            samples = resample_linear(samples, wav_rate, rate)

        if args.beam > 0:
            from april_asr_tpu.cli.transcribe import _beam_transcribe  # reuse path
            import io
            import contextlib

            buf = io.StringIO()

            class A:
                pass

            a = A()
            a.wav, a.model, a.beam = wav, args.model, args.beam
            with contextlib.redirect_stdout(buf):
                _beam_transcribe(a)
            hyp = buf.getvalue().strip().lstrip("@").strip()
        else:
            finals = []
            partial = [""]

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
            hyp = " ".join(finals) if finals else partial[0]

        acc.add(ref, hyp)
        print(f"[{i + 1}/{len(pairs)}] {acc.summary()}", file=sys.stderr)

    print(acc.summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
