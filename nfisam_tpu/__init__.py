"""nfisam_tpu: TPU-native non-Gaussian factor-graph inference (NF-iSAM class).

A brand-new JAX/XLA/Pallas implementation of incremental smoothing and
mapping via normalizing flows on the Bayes tree, with the capabilities of
MarineRoboticsGroup/NF-iSAM but designed TPU-first. See README.md.
"""
__version__ = "0.1.0"
