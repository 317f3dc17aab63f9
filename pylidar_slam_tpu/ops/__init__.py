"""Pure-functional JAX numeric kernels (the L0 layer).

Every op works on fixed-shape padded arrays with explicit validity masks so
that a single XLA compilation serves every frame of a sequence.
"""
