"""Stateful crawl state: sharded cuckoo-filter URL-seen set."""
