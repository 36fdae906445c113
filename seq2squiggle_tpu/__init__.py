"""seq2squiggle-tpu: TPU-native nanopore squiggle simulation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ZKI-PH-ImageAnalysis/seq2squiggle (reference: /root/reference): given
DNA/RNA sequence, a FastSpeech-style feed-forward transformer predicts
per-k-mer event current, dwell time, and amplitude-noise stdev; a
vectorized on-device segment-expand assembles the raw signal, which is
digitised and streamed to SLOW5/BLOW5 (and POD5).

Design is TPU-first: one jitted inner loop per batch (encoder -> heads ->
on-device Gamma/normal sampling -> gather-based length regulation ->
decoder -> noise -> clamp), static shapes throughout, data-parallel
sharding over a jax.sharding.Mesh with zero inner-loop collectives.
"""

__version__ = "0.1.0"
