"""C-consumer packaging: pkg-config install + compile-link flow.

The reference lets C programs depend on it via pkg-config: CMake installs
libaprilasr + april_api.h and generates april-asr.pc from april-asr.pc.in
(reference: april-asr.pc.in:1-10, CMakeLists.txt:138-152). This test pins the
TPU build's equivalent (native/Makefile):

  make install  -> staged prefix gets lib/libapril_tpu.so,
                   include/april-tpu/april_tpu_api.h, lib/pkgconfig/april-tpu.pc
  make check    -> pkg-config resolves `april-tpu` and examples/c/main.c
                   compiles and links against the installed tree.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None
    or shutil.which("make") is None
    or shutil.which("pkg-config") is None,
    reason="needs g++/make/pkg-config",
)


def test_make_install_and_pkgconfig_link(tmp_path):
    stage = tmp_path / "stage"
    build = tmp_path / "build"
    env_args = [f"DESTDIR={stage}", "PREFIX=/usr/local", f"BUILDDIR={build}"]
    subprocess.run(
        ["make", "-C", str(ROOT / "native"), "check", *env_args],
        check=True,
        capture_output=True,
        text=True,
    )
    prefix = stage / "usr/local"
    assert (prefix / "lib/libapril_tpu.so").exists()
    assert (prefix / "include/april-tpu/april_tpu_api.h").exists()
    pc = prefix / "lib/pkgconfig/april-tpu.pc"
    assert pc.exists()
    # the example binary linked by `make check`
    assert (build / "example_main").exists()

    # pkg-config resolves the module and emits usable flags
    env = {
        "PKG_CONFIG_PATH": str(prefix / "lib/pkgconfig"),
        "PKG_CONFIG_SYSROOT_DIR": str(stage),
        "PATH": "/usr/bin:/bin",
    }
    out = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "april-tpu"],
        check=True,
        capture_output=True,
        text=True,
        env=env,
    ).stdout
    assert "include/april-tpu" in out and "-lapril_tpu" in out
