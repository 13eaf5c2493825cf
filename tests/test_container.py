"""Round-trip and validation tests for the .april container and PARAMS blob
(format per reference src/file/model_file.c:57-129 and src/params.c:46-111)."""

import io

import pytest

from april_asr_tpu.io import (
    AprilContainer,
    BinaryFormatError,
    ModelParameters,
    build_vocab_tables,
    read_container,
    read_params,
    write_container,
    write_params,
)


def make_params(**kw):
    defaults = dict(
        batch_size=1,
        segment_size=9,
        segment_step=4,
        mel_features=80,
        sample_rate=16000,
        frame_shift_ms=10,
        frame_length_ms=25,
        round_pow2=True,
        mel_low=20,
        mel_high=0,
        snip_edges=False,
        blank_id=0,
        tokens=[b"<blk>", b" hello", b" world", b"ing", b".", b",", b"!", b"?", b"3", b" 10"],
    )
    defaults.update(kw)
    return ModelParameters(**defaults)


def test_params_roundtrip():
    p = make_params()
    blob = write_params(p)
    p2 = read_params(io.BytesIO(blob))
    assert p2 == p
    assert p2.token_count == 10
    assert p2.token_str(1) == " hello"


def test_params_validation_rejects_bad_batch():
    p = make_params(batch_size=2)
    blob = write_params(p)
    with pytest.raises(BinaryFormatError):
        read_params(io.BytesIO(blob))


def test_params_validation_rejects_bad_blank():
    p = make_params(blank_id=10)
    blob = write_params(p)
    with pytest.raises(BinaryFormatError):
        read_params(io.BytesIO(blob))


def test_container_roundtrip(tmp_path):
    c = AprilContainer(
        language="en-us",
        name="Test Model",
        description="A test model",
        model_type=1,
        params=make_params(),
        networks=[b"encoder-bytes", b"decoder-bytes", b"joiner-bytes!"],
    )
    path = tmp_path / "test.april"
    write_container(path, c)
    c2 = read_container(path)
    assert c2.language == "en-us"
    assert c2.name == "Test Model"
    assert c2.description == "A test model"
    assert c2.model_type == 1
    assert c2.networks == c.networks
    assert c2.params == c.params


def test_container_rejects_bad_magic(tmp_path):
    path = tmp_path / "bad.april"
    path.write_bytes(b"NOTMAGIC" + b"\0" * 64)
    with pytest.raises(BinaryFormatError):
        read_container(path)


def test_container_rejects_truncated(tmp_path):
    c = AprilContainer(
        language="en",
        name="t",
        description="d",
        model_type=1,
        params=make_params(),
        networks=[b"x" * 100],
    )
    path = tmp_path / "t.april"
    write_container(path, c)
    data = path.read_bytes()
    (tmp_path / "trunc.april").write_bytes(data[: len(data) // 2])
    with pytest.raises(BinaryFormatError):
        read_container(tmp_path / "trunc.april")


def test_vocab_tables():
    p = make_params()
    t = build_vocab_tables(p)
    # " hello" and " world" and " 10" start words
    assert t.word_boundary[1] and t.word_boundary[2] and t.word_boundary[9]
    assert not t.word_boundary[3]
    # "." "!" "?" end sentences; "," is punctuation but not sentence end
    assert t.end_sentence[4] and t.end_sentence[6] and t.end_sentence[7]
    assert not t.end_sentence[5]
    assert t.punctuation[5]
    # "3" starts with a digit; " 10" starts with space (not digit)
    assert t.starts_digit[8]
    assert not t.starts_digit[9]
    assert t.is_dot[4] and not t.is_dot[5]
