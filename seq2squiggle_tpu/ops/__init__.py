"""Core TPU ops: attention blocks, positional encodings, length regulation."""
