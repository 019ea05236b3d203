"""End-to-end pipeline plans (lazy DataFrame compositions)."""
