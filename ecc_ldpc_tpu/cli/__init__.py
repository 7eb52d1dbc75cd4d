"""`ecc-sim`-style CLI (SURVEY.md §2.2 C26)."""
