"""Model zoo (ref: examples/ — gpt-2, gpt-j, mnist, sam, yolo, magika)."""
