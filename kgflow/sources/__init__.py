"""Sources & sinks: CSV/TSV readers, OBO lexicon loader, JSON export."""
