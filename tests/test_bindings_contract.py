"""ABI-contract conformance for the toolchain-less bindings (VERDICT weak).

The Java (JNA) and C# (P/Invoke) bindings are thin clients over the native
C ABI library (native/april_capi.cc — compiled and driven live by ci.sh and
tests/test_capi.py); their own framing IS that library's. What a JDK/dotnet
-free environment can still verify is the part where they could silently
drift: the ABI CONTRACT they declare in source — result-type codes, config
flag bits, token flag bits, the 16-byte speaker id, the exported symbol
names. These tests parse the binding sources and pin them against
native/april_tpu_api.h and the Python constants (reference contract:
april_api.h:86-174)."""

import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
HEADER = os.path.join(ROOT, "native", "april_tpu_api.h")
JAVA = os.path.join(
    ROOT, "bindings", "java", "src", "main", "java", "aprilasr",
    "AprilTpuLibrary.java",
)
CSHARP = os.path.join(ROOT, "bindings", "csharp", "AprilAsrTpu", "Native.cs")

# The canonical contract (native/april_tpu_api.h == reference april_api.h)
RESULTS = {
    "APRIL_RESULT_UNKNOWN": 0,
    "APRIL_RESULT_RECOGNITION_PARTIAL": 1,
    "APRIL_RESULT_RECOGNITION_FINAL": 2,
    "APRIL_RESULT_ERROR_CANT_KEEP_UP": 3,
    "APRIL_RESULT_SILENCE": 4,
}
CONFIG_FLAGS = {
    "APRIL_CONFIG_FLAG_ASYNC_RT_BIT": 1,
    "APRIL_CONFIG_FLAG_ASYNC_NO_RT_BIT": 2,
}
TOKEN_FLAGS = {
    "APRIL_TOKEN_FLAG_WORD_BOUNDARY_BIT": 1,
    "APRIL_TOKEN_FLAG_SENTENCE_END_BIT": 2,
}
ABI_FUNCTIONS = (
    "aam_api_init", "aam_create_model", "aam_get_name", "aam_get_description",
    "aam_get_language", "aam_get_sample_rate", "aam_free",
    "aas_create_session", "aas_feed_pcm16", "aas_flush",
    "aas_realtime_get_speedup", "aas_free",
)


def _read(path):
    with open(path, encoding="utf-8") as f:
        return f.read()


def _assert_constants(src, mapping, pattern):
    for name, value in mapping.items():
        m = re.search(pattern.format(name=re.escape(name)), src)
        assert m, f"{name} not declared"
        got = int(m.group(1), 0)
        assert got == value, f"{name} = {got}, contract says {value}"


def test_header_matches_reference_contract():
    src = _read(HEADER)
    pat = r"{name}\s*=\s*(0x[0-9a-fA-F]+|\d+)"
    _assert_constants(src, RESULTS, pat)
    _assert_constants(src, CONFIG_FLAGS, pat)
    _assert_constants(src, TOKEN_FLAGS, pat)
    for fn in ABI_FUNCTIONS:
        assert re.search(rf"\b{fn}\s*\(", src), f"{fn} missing from ABI header"


def test_python_constants_match():
    from april_asr_tpu.decode import events as ev
    from april_asr_tpu.decode.scalar import (
        RESULT_CANT_KEEP_UP,
        RESULT_FINAL,
        RESULT_PARTIAL,
        RESULT_SILENCE,
    )

    assert RESULT_PARTIAL == RESULTS["APRIL_RESULT_RECOGNITION_PARTIAL"]
    assert RESULT_FINAL == RESULTS["APRIL_RESULT_RECOGNITION_FINAL"]
    assert RESULT_CANT_KEEP_UP == RESULTS["APRIL_RESULT_ERROR_CANT_KEEP_UP"]
    assert RESULT_SILENCE == RESULTS["APRIL_RESULT_SILENCE"]
    assert ev.FLAG_WORD_BOUNDARY == TOKEN_FLAGS["APRIL_TOKEN_FLAG_WORD_BOUNDARY_BIT"]
    assert ev.FLAG_SENTENCE_END == TOKEN_FLAGS["APRIL_TOKEN_FLAG_SENTENCE_END_BIT"]


def test_java_binding_contract():
    src = _read(JAVA)
    pat = r"int\s+{name}\s*=\s*(0x[0-9a-fA-F]+|\d+)\s*;"
    _assert_constants(
        src, {k: v for k, v in RESULTS.items() if v != 0}, pat
    )
    _assert_constants(src, CONFIG_FLAGS, pat)
    # 16-byte speaker id ahead of handler/userdata/flags (struct layout)
    assert re.search(r"speaker\s*=\s*new byte\[16\]", src)
    assert re.search(
        r'FieldOrder\(\{"speaker",\s*"handler",\s*"userdata",\s*"flags"\}\)', src
    ), "NativeConfig field order drifted from AprilConfig"
    for fn in ABI_FUNCTIONS:
        assert fn in src or fn in _read(
            os.path.join(os.path.dirname(JAVA), "Model.java")
        ) + _read(os.path.join(os.path.dirname(JAVA), "Session.java")), (
            f"Java binding never references {fn}"
        )


def test_csharp_binding_contract():
    src = _read(CSHARP) + _read(
        os.path.join(os.path.dirname(CSHARP), "AprilAsr.cs")
    )
    # result codes appear as enum values
    for name, value in RESULTS.items():
        short = name.replace("APRIL_RESULT_", "").title().replace("_", "")
        assert re.search(
            rf"=\s*{value}\b", src
        ), f"C# sources never bind value {value} ({name})"
    # 16-byte speaker id
    assert re.search(r"SizeConst\s*=\s*16", src), "speaker id is not 16 bytes"
    for fn in ABI_FUNCTIONS:
        assert fn in src, f"C# binding never references {fn}"


def test_bindings_use_same_library_name():
    """All three clients must dlopen the same shared library."""
    java = _read(JAVA)
    cs = _read(CSHARP)
    assert "april_tpu" in java
    assert "april_tpu" in cs
