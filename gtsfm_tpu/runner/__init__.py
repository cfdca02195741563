"""CLI runners (reference gtsfm/runner/): argparse entry points per loader."""
