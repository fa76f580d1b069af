"""Structured Streaming runtime: watermarks, streaming over-window emulation,
stateful operators, sinks/taps, and the reference-parity payment pipeline."""
