"""Runtime: jitted inference loop, batching, streaming export."""
