"""Cold-path utilities: image and state-file IO."""
