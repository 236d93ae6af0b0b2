"""Multi-chip / multi-host sharding for the TPU-native aligner."""
