"""Image extraction (reference extract.rs:3352-3565): figure-first with
figcaption, data-src lazy loading, hero via og:image filename match else
first image."""

from __future__ import annotations

from typing import Optional

from ..dom import Document, Element, select
from ..functions.textnorm import clean_text
from ..functions.urlutils import extract_filename, filenames_match


def _img_src(img: Element) -> Optional[str]:
    src = (img.get("src") or "").strip() or (img.get("data-src") or "").strip()
    return src or None


def _image_record(src: str, alt: Optional[str], caption: Optional[str]) -> dict:
    return {
        "src": src,
        "filename": extract_filename(src),
        "alt": alt or None,
        "caption": caption or None,
        "is_hero": False,
    }


def extract_images(doc: Document, content_node: Optional[Element],
                   og_image: Optional[str]) -> list[dict]:
    images: list[dict] = []
    seen: set[str] = set()

    def scan(node: Element) -> None:
        for figure in select(node, "figure"):
            img = next(iter(select(figure, "img")), None)
            if img is None:
                continue
            src = _img_src(img)
            if not src or src in seen:
                continue
            seen.add(src)
            cap_el = next(iter(select(figure, "figcaption")), None)
            caption = clean_text(cap_el.text_content()) if cap_el is not None else None
            images.append(_image_record(src, (img.get("alt") or "").strip(), caption))
        for img in select(node, "img"):
            src = _img_src(img)
            if not src or src in seen:
                continue
            seen.add(src)
            images.append(_image_record(src, (img.get("alt") or "").strip(), None))

    if content_node is not None:
        scan(content_node)
    if not images:
        scan(doc.body)

    # hero: og:image filename match, else first
    if images:
        hero_idx = 0
        if og_image:
            for i, im in enumerate(images):
                if filenames_match(im["src"], og_image):
                    hero_idx = i
                    break
        images[hero_idx]["is_hero"] = True
    return images
