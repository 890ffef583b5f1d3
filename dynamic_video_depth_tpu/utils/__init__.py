"""Host-side utilities: visualization converters, HTML reports, printing."""
