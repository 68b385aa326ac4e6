"""rattle_tpu: TPU-native reference-free transcriptome reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
comprna/RATTLE (clustering, error correction, consensus polishing of Nanopore
long reads) designed TPU-first: batched device kernels for k-mer sketching,
similarity scoring, and partial-order alignment; host drivers replay the
reference's greedy semantics exactly.
"""

__version__ = "0.1.0"
