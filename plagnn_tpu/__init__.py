"""plagnn-tpu: a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
quinlanW/PLA-GNN (protein mis-localization under drug perturbation):
full-batch graph convolutions over sparse PPI adjacency with ECC /
co-expression node features and multi-label subcellular-localization heads,
scalable across TPU meshes via edge-partitioned sharding.
"""

__version__ = "0.1.0"
