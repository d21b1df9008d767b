"""Box/label drawing on images (PIL), reference-parity visualization.

Rebuild of the reference viz utilities (``utils/detection_utils.py:32-191``):
the 120-color table, per-box drawing with label text, and the array-level
entry point ``visualize_boxes_and_labels_on_image_array`` with the same
signature shape (normalized or absolute coordinates, category index, score
display) used by the demo notebook for GT-vs-prediction comparison.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

# The reference's color table (utils/detection_utils.py:32-56 uses PIL's
# named colors); a deterministic 120-entry palette.
STANDARD_COLORS: List[str] = [
    "AliceBlue", "Chartreuse", "Aqua", "Aquamarine", "Azure", "Beige", "Bisque",
    "BlanchedAlmond", "BlueViolet", "BurlyWood", "CadetBlue", "AntiqueWhite",
    "Chocolate", "Coral", "CornflowerBlue", "Cornsilk", "Crimson", "Cyan",
    "DarkCyan", "DarkGoldenRod", "DarkGrey", "DarkKhaki", "DarkOrange",
    "DarkOrchid", "DarkSalmon", "DarkSeaGreen", "DarkTurquoise", "DarkViolet",
    "DeepPink", "DeepSkyBlue", "DodgerBlue", "FireBrick", "FloralWhite",
    "ForestGreen", "Fuchsia", "Gainsboro", "GhostWhite", "Gold", "GoldenRod",
    "Salmon", "Tan", "HoneyDew", "HotPink", "IndianRed", "Ivory", "Khaki",
    "Lavender", "LavenderBlush", "LawnGreen", "LemonChiffon", "LightBlue",
    "LightCoral", "LightCyan", "LightGoldenRodYellow", "LightGray", "LightGrey",
    "LightGreen", "LightPink", "LightSalmon", "LightSeaGreen", "LightSkyBlue",
    "LightSlateGray", "LightSlateGrey", "LightSteelBlue", "LightYellow", "Lime",
    "LimeGreen", "Linen", "Magenta", "MediumAquaMarine", "MediumOrchid",
    "MediumPurple", "MediumSeaGreen", "MediumSlateBlue", "MediumSpringGreen",
    "MediumTurquoise", "MediumVioletRed", "MintCream", "MistyRose", "Moccasin",
    "NavajoWhite", "OldLace", "Olive", "OliveDrab", "Orange", "OrangeRed",
    "Orchid", "PaleGoldenRod", "PaleGreen", "PaleTurquoise", "PaleVioletRed",
    "PapayaWhip", "PeachPuff", "Peru", "Pink", "Plum", "PowderBlue", "Purple",
    "Red", "RosyBrown", "RoyalBlue", "SaddleBrown", "Green", "SandyBrown",
    "SeaGreen", "SeaShell", "Sienna", "Silver", "SkyBlue", "SlateBlue",
    "SlateGray", "SlateGrey", "Snow", "SpringGreen", "SteelBlue", "GreenYellow",
    "Teal", "Thistle", "Tomato", "Turquoise", "Violet", "Wheat", "White",
    "WhiteSmoke", "Yellow", "YellowGreen",
]


def draw_bounding_box_on_image(
    image,
    ymin: float,
    xmin: float,
    ymax: float,
    xmax: float,
    color: str = "red",
    thickness: int = 4,
    display_str_list: Sequence[str] = (),
    use_normalized_coordinates: bool = True,
) -> None:
    """Draw one box + label strings on a PIL image in place
    (reference draw_bounding_box_on_image, utils/detection_utils.py:59-131)."""
    from PIL import ImageDraw, ImageFont

    draw = ImageDraw.Draw(image)
    im_width, im_height = image.size
    if use_normalized_coordinates:
        left, right = xmin * im_width, xmax * im_width
        top, bottom = ymin * im_height, ymax * im_height
    else:
        left, right, top, bottom = xmin, xmax, ymin, ymax
    draw.line(
        [(left, top), (left, bottom), (right, bottom), (right, top), (left, top)],
        width=thickness,
        fill=color,
    )
    try:
        font = ImageFont.truetype("arial.ttf", 24)
    except OSError:
        font = ImageFont.load_default()

    def text_size(s: str):
        bbox = font.getbbox(s)
        return bbox[2] - bbox[0], bbox[3] - bbox[1]

    display_str_heights = [text_size(ds)[1] for ds in display_str_list]
    total_height = (1 + 2 * 0.05) * sum(display_str_heights)
    text_bottom = top if top > total_height else bottom + total_height
    for display_str in display_str_list[::-1]:
        text_width, text_height = text_size(display_str)
        margin = int(np.ceil(0.05 * text_height))
        draw.rectangle(
            [
                (left, text_bottom - text_height - 2 * margin),
                (left + text_width, text_bottom),
            ],
            fill=color,
        )
        draw.text(
            (left + margin, text_bottom - text_height - margin),
            display_str,
            fill="black",
            font=font,
        )
        text_bottom -= text_height - 2 * margin


def visualize_boxes_and_labels_on_image_array(
    image: np.ndarray,
    boxes: np.ndarray,
    classes: Sequence[int],
    scores: Optional[Sequence[float]],
    label_map: Optional[Sequence[str]] = None,
    use_normalized_coordinates: bool = False,
    max_boxes_to_draw: Optional[int] = 20,
    min_score_thresh: float = 0.5,
    line_thickness: int = 4,
) -> np.ndarray:
    """Draw detections on an HWC uint8/float image array
    (reference visualize_boxes_and_labels_on_image_array,
    utils/detection_utils.py:134-191). Boxes are XYXY (x1, y1, x2, y2);
    ``scores=None`` draws groundtruth in black like the reference."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    pil = Image.fromarray(arr)

    boxes = np.asarray(boxes).reshape(-1, 4)
    n = len(boxes) if max_boxes_to_draw is None else min(len(boxes), max_boxes_to_draw)
    for i in range(n):
        if scores is not None and float(scores[i]) < min_score_thresh:
            continue
        cls = int(classes[i])
        if label_map is not None and 0 <= cls < len(label_map):
            name = str(label_map[cls])
        else:
            name = f"class {cls}"
        if scores is None:
            color, label = "black", name
        else:
            color = STANDARD_COLORS[cls % len(STANDARD_COLORS)]
            label = f"{name}: {int(100 * float(scores[i]))}%"
        x1, y1, x2, y2 = (float(v) for v in boxes[i])
        draw_bounding_box_on_image(
            pil, y1, x1, y2, x2, color, line_thickness, [label],
            use_normalized_coordinates=use_normalized_coordinates,
        )
    return np.array(pil)
