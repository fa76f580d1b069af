"""Sources & sinks: files (batch+stream), Kafka (stream), rate/memory (test)."""
