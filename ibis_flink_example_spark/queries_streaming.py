"""Streaming queries run through Structured Streaming with availableNow
triggers, surfacing the final memory-sink table as a batch DataFrame so the
driver's oracle can still check them. Populated in M3."""
