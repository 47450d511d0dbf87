"""Native (C++) runtime sources, compiled on first use via utils.native.

The reference ships its runtime as a prebuilt pybind11 extension
(python/_nimblephysics); here the TPU compute path is XLA and the native
layer is IO-side (mmap .b3d, C3D decode), built with g++ at import time
and loaded through ctypes — no build step needed at pip-install time.
"""
