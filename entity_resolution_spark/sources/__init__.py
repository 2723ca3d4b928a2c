"""Sources/sinks: synthetic corpora, testdata readers, stage checkpoints."""
