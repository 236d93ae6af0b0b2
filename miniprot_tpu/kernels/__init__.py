"""TPU Pallas kernels for the splice/frameshift-aware DP."""
