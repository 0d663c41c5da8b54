"""Sinks: serializers that write engine results back out in the
reference's own file formats (SURVEY §2.1 S8-S11)."""
