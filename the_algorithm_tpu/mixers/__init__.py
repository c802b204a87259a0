"""Candidate-generation mixers: similarity engines, tweet-mixer, home-mixer."""
