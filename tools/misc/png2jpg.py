#!/usr/bin/env python
"""Batch-convert a folder of PNG images to JPEG.

Reference analogue: the root-level ``png2jpg.py`` (author utility with
hardcoded absolute paths); same behavior with a proper CLI.
"""
import argparse
import os


def convert_png_to_jpg(input_folder: str, output_folder: str,
                       quality: int = 95) -> int:
    from PIL import Image
    os.makedirs(output_folder, exist_ok=True)
    n = 0
    for file_name in sorted(os.listdir(input_folder)):
        if not file_name.lower().endswith('.png'):
            continue
        out_name = os.path.splitext(file_name)[0] + '.jpg'
        with Image.open(os.path.join(input_folder, file_name)) as img:
            img.convert('RGB').save(os.path.join(output_folder, out_name),
                                    'JPEG', quality=quality)
        n += 1
    return n


def main():
    p = argparse.ArgumentParser(description='PNG -> JPEG folder converter')
    p.add_argument('input_folder')
    p.add_argument('output_folder')
    p.add_argument('--quality', type=int, default=95)
    args = p.parse_args()
    n = convert_png_to_jpg(args.input_folder, args.output_folder,
                           args.quality)
    print(f'converted {n} images -> {args.output_folder}')


if __name__ == '__main__':
    main()
