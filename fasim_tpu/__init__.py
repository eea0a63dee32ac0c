"""fasim_tpu — a TPU-native triplex-scanning framework.

A from-scratch reimplementation of the capabilities of LongTarget/Fasim-LongTarget
(reference: /root/reference) designed for TPU hardware:

  * the two hot Smith-Waterman passes (threshold pass and per-column-max scan
    pass) run as JAX/Pallas anti-diagonal wavefront kernels batched over the
    48 pairing-rule transforms and over DNA segments;
  * segments are sharded data-parallel over a `jax.sharding.Mesh`;
  * the low-traffic candidate-window realignment/traceback and the global
    clustering/output stages run in a small native C++ runtime whose results
    are bit-identical to the reference implementation.

Layering (top to bottom): cli -> scan pipeline -> {kernels (TPU), native runtime}
with io/rules/config shared, and dist providing the mesh/sharding glue.
"""

__version__ = "0.1.0"
