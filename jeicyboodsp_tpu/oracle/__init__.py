"""Bit-faithful NumPy transliterations of the reference programs.

These are the *golden oracles* for the framework's compat mode: each module
reproduces one reference C++ program's observable output stream, including
its quirks (coefficient typos, uninitialized-buffer semantics, short-cast
truncation), re-derived from a close reading of the sources under
``/root/reference`` (cited per function).  They run in float64 on the host
and are deliberately slow and simple.
"""
