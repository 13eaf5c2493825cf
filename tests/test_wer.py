"""WER utility tests."""

from april_asr_tpu.utils.wer import WerAccumulator, edit_distance, normalize, wer


def test_edit_distance_basic():
    assert edit_distance("abc", "abc") == (0, 0, 0, 3)
    assert edit_distance("abc", "axc") == (1, 0, 0, 2)
    assert edit_distance("abc", "ac") == (0, 1, 0, 2)
    assert edit_distance("ac", "abc") == (0, 0, 1, 2)
    assert edit_distance("", "ab") == (0, 0, 2, 0)
    assert edit_distance("ab", "") == (0, 2, 0, 0)


def test_edit_distance_words():
    s, d, i, c = edit_distance(
        "the cat sat on the mat".split(), "the cat sit on mat".split()
    )
    assert (s, d, i) == (1, 1, 0)
    assert c == 4


def test_normalize():
    assert normalize("Hello, World!") == "HELLO WORLD"
    assert normalize("don't  stop") == "DON'T STOP"
    assert normalize("a\tb\nc") == "A B C"


def test_corpus_wer():
    acc = WerAccumulator()
    acc.add("the cat sat", "the cat sat")
    acc.add("hello world", "hello word there")
    # utt1: 0 errors / 3 words; utt2: 1 sub + 1 ins / 2 words
    assert acc.ref_words == 5
    assert abs(acc.wer - 2 / 5) < 1e-9
    assert "WER 40.00%" in acc.summary()


def test_wer_helper():
    assert wer([("a b c", "a b c")]) == 0.0
    assert wer([("a b", "a x")]) == 0.5
