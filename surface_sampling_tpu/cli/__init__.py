"""Command-line workflow layer (scripts/ analog of the reference)."""
