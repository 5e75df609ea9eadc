"""Self-contained file-format implementations (F2 Avro container)."""
