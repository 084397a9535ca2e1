"""Build hook: compile the C++ runtime into the package before packaging.

The native library (marching, mesh post-processing, BVH closest-point,
radix utilities) is a plain C-ABI shared object loaded via ctypes — not a
CPython extension — so it is built here with g++ directly and shipped as
package data. At runtime surfd_tpu.native falls back to building from
native/ on first use when the .so is absent (source checkouts).
"""

import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).parent
        script = root / "native" / "build.sh"
        if script.exists():
            subprocess.run(["sh", str(script)], check=True)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
