"""Sources & sinks: landing-zone NDJSON, bronze loader, Kafka (gated)."""
