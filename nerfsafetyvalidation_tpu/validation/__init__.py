"""Safety-validation layer (reference L6: validation/)."""
