"""Build hooks: ship the native host runtime inside the wheel.

The reference ships its .so inside the Python wheel
(reference: bindings/python/setup.py:20-37 packages libaprilasr into the
april_asr package dir). Equivalent here, generalized to this framework's
three native artifacts:

  april_asr_tpu/native/_src/   the C/C++ sources (always packaged, so an
                               installed wheel can rebuild on any machine
                               with a compiler — the runtime loaders fall
                               back to build-on-first-use from these)
  april_asr_tpu/native/_lib/   prebuilt binaries when the BUILD machine has
                               a toolchain: libapril_native.so (SPSC ring +
                               time stretcher), libapril_tpu.so (C ABI
                               client), _replay<ext>.so (packed-event
                               replay CPython extension)

`pip wheel .` / `pip install .` runs this automatically; environments
without gcc/g++ still get a working wheel (sources only — pure-NumPy
fallbacks cover the rest, april_asr_tpu/native/__init__.py).
"""

import shutil
import subprocess
import sys
import sysconfig
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).parent
NATIVE_SRCS = ["april_native.cc", "april_capi.cc", "april_tpu_api.h", "replay_ext.c"]


def _try(cmd) -> bool:
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:  # compiler missing, etc. — wheel still works
        print(f"native build skipped: {cmd[0]}: {e}", file=sys.stderr)
        return False


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        pkg_native = Path(self.build_lib) / "april_asr_tpu" / "native"
        src_dir = pkg_native / "_src"
        lib_dir = pkg_native / "_lib"
        src_dir.mkdir(parents=True, exist_ok=True)
        lib_dir.mkdir(parents=True, exist_ok=True)
        for name in NATIVE_SRCS:
            shutil.copy2(ROOT / "native" / name, src_dir / name)
        (src_dir / "__init__.py").touch()
        (lib_dir / "__init__.py").touch()

        gxx = shutil.which("g++")
        gcc = shutil.which("gcc")
        if gxx:
            _try([gxx, "-O2", "-shared", "-fPIC", "-std=c++17",
                  str(ROOT / "native" / "april_native.cc"),
                  "-o", str(lib_dir / "libapril_native.so")])
            _try([gxx, "-O2", "-shared", "-fPIC", "-std=c++17",
                  str(ROOT / "native" / "april_capi.cc"),
                  "-o", str(lib_dir / "libapril_tpu.so"), "-pthread"])
        if gcc:
            inc = sysconfig.get_paths()["include"]
            ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
            _try([gcc, "-O2", "-shared", "-fPIC", f"-I{inc}",
                  str(ROOT / "native" / "replay_ext.c"),
                  "-o", str(lib_dir / f"_replay{ext}")])


setup(cmdclass={"build_py": BuildPyWithNative})
