"""Domain vocabularies and pure scalar functions (no Ray dependencies)."""
