"""TPU-native DMT: Deep Multifaceted Transformers for multi-objective ranking.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
guyulongcs/CIKM2020_DMT (reference: /root/reference/DMT_code).  The compute
path is jit-compiled XLA with Pallas kernels for the hot ops; parallelism is
expressed as shardings over a ``jax.sharding.Mesh`` (data x model axes)
instead of the reference's in-graph multi-GPU towers
(reference run_dnn.py:148-207).
"""

__version__ = "0.1.0"
