"""floodsr-tpu: TPU-native raster super-resolution for flood-depth grids.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
CPU/ONNX-Runtime implementation (cefect/floodsr). The public surface mirrors
the reference: `floodsr {tohr,models,doctor}` CLI, a `models.json` registry,
a checksum-verified weights cache, per-model workers, and an engine
abstraction — while the compute path (normalization, ResUNet forward, tile
mosaicking) runs as batched, jit-compiled device code.
"""

__version__ = "1.0.0"
