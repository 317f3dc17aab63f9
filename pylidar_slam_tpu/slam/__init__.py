"""SLAM pipeline modules (Initialization -> Preprocessing -> Odometry ->
Loop Closure -> Backend), re-designed TPU-first.

Module contract: like the reference (slam/slam.py), each pipeline stage reads
and writes well-known string keys of a per-frame ``data_dict`` at the host
boundary.  Internally every stage keeps explicit jax pytree state and steps it
with jit-compiled pure functions over fixed-shape arrays.
"""
