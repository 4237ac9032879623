"""Minimal numpy shim for the TransportMaps API surface the reference
codebase (/root/reference) actually touches, so the reference NF-iSAM can
run here as a CPU baseline for BENCHMARKS.md.  Symbols implemented are
exactly those enumerated from the reference source:
``dist.{Distribution,GaussianDistribution,StandardNormalDistribution,
PullBackTransportMapDistribution}``, ``like.{LikelihoodBase,LogLikelihood,
AdditiveLinearGaussianLogLikelihood}``, ``maps.TransportMap``.

This package is benchmark harness code for /root/repo only; it is NOT part
of the nfisam_tpu framework and is never imported by it.
"""
