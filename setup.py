"""Build hook: compile the native C++ components (csrc/) alongside the
Python package. The libraries are optional at runtime — the metrics fall
back to their Python reference implementations when absent — so build
failures only disable the fast paths."""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        csrc = Path(__file__).parent / "csrc"
        try:
            subprocess.run(["make", "-C", str(csrc)], check=True)
        except Exception as e:  # pragma: no cover
            print(f"warning: native build skipped ({e})", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
