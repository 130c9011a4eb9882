"""Physical operator builders (all declarative DataFrame compositions)."""
