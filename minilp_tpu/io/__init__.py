"""Problem I/O: MPS reader (reference C7) and friends."""
