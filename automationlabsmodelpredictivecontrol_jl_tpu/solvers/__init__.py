"""solvers subpackage."""
