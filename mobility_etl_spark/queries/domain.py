"""Domain parsers (delay strings, GTFS times): placeholder, filled next."""
