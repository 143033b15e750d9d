"""Console hint text (SURVEY S10 remainder): the reference's
post-conversion import instructions and the notion2skos rule summary,
reproduced string-for-string.

Reference: print_import_instructions (skos_converter.py:1926-1957) and
print_skos_conversion_summary (:1960-1969). Returned as line lists so
callers print or log them; content is byte-identical to the reference's
stdout (pinned by tests/test_console_text.py).
"""

from __future__ import annotations

_IMPORT_LINES = {
    "csv": [
        "\nCSV Import Instructions:",
        "• Import into Notion, Excel, or any spreadsheet application",
        "• Use 'Title' column as the main identifier",
        "• 'Parent' column shows hierarchical relationships",
        "• Filter/group by 'Concept Scheme' or 'Level'",
    ],
    "markdown": [
        "\nMarkdown Import Instructions:",
        "• Copy/paste into Notion, Confluence, or any markdown editor",
        "• Simple hierarchical structure with clean headings",
        "• In Notion: Use Cmd/Ctrl+Shift+7 to convert to toggle lists",
        "• No extra formatting - ready for direct use",
    ],
    "json": [
        "\nJSON Import Instructions:",
        "• Use with APIs (Notion API, custom applications)",
        "• Structured data with full hierarchy preserved",
        "• Contains complete concept metadata and relationships",
    ],
    "xml": [
        "\nXML Import Instructions:",
        "• Go to Confluence Space Settings → Content Tools → Import",
        "• Choose 'Confluence XML' as import format",
        "• Upload the generated XML file",
        "• Content imports with expandable sections and info panels",
    ],
}


def import_instructions(format_type: str) -> list[str]:
    """The reference's format-specific import hints (:1926-1957): a
    completion banner plus the per-format bullet list (empty bullets for
    formats the reference doesn't hint, exactly like its if/elif)."""
    return [
        f"\nConversion to {format_type.upper()} complete!"
    ] + _IMPORT_LINES.get(format_type, [])


def skos_conversion_summary() -> list[str]:
    """The notion2skos rule summary (:1960-1969), string-for-string."""
    return [
        "\n✅ Notion to SKOS conversion complete!",
        "\nConversion rules applied:",
        "- H1 headers → SKOS Concept Schemes",
        "- H2 headers → Top Concepts",
        "- H3+ headers → Narrower concepts with broader relationships",
        "- All concepts have skos:inScheme relationship",
        "- New concepts assigned UUID-based URIs",
        "- Missing definitions replaced with 'Lorem ipsum'",
    ]
