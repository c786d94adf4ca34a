"""Sources & sinks: parquet catalog, CSV/JSON IO, binary (multimodal),
micro-batch streaming readers."""
