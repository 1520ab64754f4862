"""Tag-interpretation rule kernel (OsmPostProcessor.java:244-354; exact
semantics catalogued in SURVEY.md §2.8)."""

from __future__ import annotations

# category whitelist: each of these tags contributes "<tag>:<value>";
# highway additionally contributes "street" (OsmPostProcessor.java:258-293).
# NB "admin-level" with a dash is what the reference switches on — not OSM's
# real admin_level key; replicated as written.
_CATEGORY_TAGS = frozenset(
    [
        "leisure",
        "amenity",
        "natural",
        "historic",
        "cuisine",
        "tourism",
        "shop",
        "building",
        "admin-level",
    ]
)


def _has_pair(tags: dict[str, str], key: str, value: str) -> bool:
    """Case-insensitive value equality (OsmPostProcessor.java:347-354)."""
    v = tags.get(key)
    return v is not None and v.lower() == value.lower()


def interpret_tags(tag_items: list[dict]) -> dict | None:
    """tags → {categories, address, names, links} or None (drop row).

    ``tag_items`` is the engine's list<struct<key,value>> tag column as
    pylist.  Returns None when no category matched — the reference drops
    such rows entirely (OsmPostProcessor.java:332-337).
    """
    tags = {t["key"]: t["value"] for t in tag_items}
    address: list[dict] = []
    names: dict[str, list[str]] = {}
    categories: set[str] = set()
    for t in tag_items:
        k, v = t["key"], t["value"]
        if k.startswith("addr:"):
            address.append({"key": k[5:], "value": v})
        elif k.startswith("name:"):
            names.setdefault(k[5:], []).append(v)
        elif k == "highway":
            categories.add("street")
            categories.add(f"{k}:{v}")
        elif k in _CATEGORY_TAGS:
            categories.add(f"{k}:{v}")

    # pair rules (OsmPostProcessor.java:297-330)
    if _has_pair(tags, "building", "yes"):
        if _has_pair(tags, "amenity", "public_building"):
            categories.add("public-building")
        else:
            categories.add("building")
    if _has_pair(tags, "railway", "tram_stop"):
        categories.add("tram-stop")
    if _has_pair(tags, "railway", "station"):
        categories.add("train-station")
    if _has_pair(tags, "railway", "halt"):
        categories.add("train-station")
    if _has_pair(tags, "station", "light_rail"):
        categories.add("light-rail-station")
    if _has_pair(tags, "public_transport", "stop_position"):
        if _has_pair(tags, "light_rail", "yes"):
            categories.add("light-rail-station")
        elif _has_pair(tags, "bus", "yes"):
            categories.add("bus-stop")
        elif _has_pair(tags, "railway", "halt"):
            categories.add("train-station")

    if not categories:
        return None  # skip uncategorizable stuff (:335-337)

    links = [tags["website"]] if "website" in tags else []
    return {
        "categories": sorted(categories),  # stored as a set in the reference
        "address": address,
        "names": [{"lang": k, "values": v} for k, v in names.items()],
        "links": links,
    }
