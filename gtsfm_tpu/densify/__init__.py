"""Densification (MVS): plane-sweep depth estimation + geometric-consistency
fusion (reference gtsfm/densify/ — MVSBase API, PatchmatchNet engine)."""
