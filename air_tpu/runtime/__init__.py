"""Native (C++) host runtime: record IO + shuffle/batch loader.

Built on demand from air_tpu/runtime/loader.cc (see build_native()); the
pure-numpy loader in air_tpu.data.loader is the semantic reference and the
fallback when the toolchain is unavailable.
"""

from air_tpu.runtime.native import NativeShuffleLoader, build_native  # noqa: F401
