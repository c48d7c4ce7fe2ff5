"""Build hook: ship the native csrc sources (+ a prebuilt libspeechdata.so
when a toolchain is present) inside the wheel under speecht5_tpu/_csrc.

speecht5_tpu.data.native searches the repo-level csrc/ first (editable
installs / checkouts), then the packaged _csrc/, and rebuilds with `make`
whenever the sources are newer than the library — so both `pip install -e .`
and a plain wheel install get the native decoders with no manual step, and
degrade to the numpy fallbacks without a toolchain.
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        csrc = os.path.join(here, "csrc")
        if not os.path.isdir(csrc):
            return
        dest = os.path.join(self.build_lib, "speecht5_tpu", "_csrc")
        os.makedirs(dest, exist_ok=True)
        for name in os.listdir(csrc):
            if name.endswith((".cpp", ".cc", ".h", ".hpp")) or name == "Makefile":
                shutil.copy2(os.path.join(csrc, name), dest)
        try:
            subprocess.run(["make", "-C", dest, "-B"], check=True,
                           capture_output=True)
        except Exception:
            pass  # no toolchain at build time: native.py rebuilds on import


setup(cmdclass={"build_py": BuildWithNative})
