"""segger-tpu: a TPU-native framework for IST cell segmentation.

Re-implements the capabilities of dpeerlab/segger (link prediction on
heterogeneous spatial graphs) with a JAX/XLA/Pallas compute path designed
for TPU hardware: padded-CSR sparse layouts, static-shape tile batches,
SPMD over device meshes.
"""
__version__ = "0.1.0"
