"""Custom operators that sit above the DataFrame API."""
