"""Golden test for the console hint text (SURVEY S10 remainder).

Expected strings below were captured by EXECUTING the reference's
print_import_instructions / print_skos_conversion_summary
(skos_converter.py:1926-1969) under tools/rdflib_stub with py3.12 —
the same vendoring protocol as tools/gen_golden.py.
"""

from __future__ import annotations

from skosconverter_spark.operators.console import (
    import_instructions,
    skos_conversion_summary,
)

EXPECTED = {
    "csv": (
        "\nConversion to CSV complete!\n\nCSV Import Instructions:\n"
        "• Import into Notion, Excel, or any spreadsheet application\n"
        "• Use 'Title' column as the main identifier\n"
        "• 'Parent' column shows hierarchical relationships\n"
        "• Filter/group by 'Concept Scheme' or 'Level'\n"
    ),
    "markdown": (
        "\nConversion to MARKDOWN complete!\n\nMarkdown Import Instructions:\n"
        "• Copy/paste into Notion, Confluence, or any markdown editor\n"
        "• Simple hierarchical structure with clean headings\n"
        "• In Notion: Use Cmd/Ctrl+Shift+7 to convert to toggle lists\n"
        "• No extra formatting - ready for direct use\n"
    ),
    "json": (
        "\nConversion to JSON complete!\n\nJSON Import Instructions:\n"
        "• Use with APIs (Notion API, custom applications)\n"
        "• Structured data with full hierarchy preserved\n"
        "• Contains complete concept metadata and relationships\n"
    ),
    "xml": (
        "\nConversion to XML complete!\n\nXML Import Instructions:\n"
        "• Go to Confluence Space Settings → Content Tools → Import\n"
        "• Choose 'Confluence XML' as import format\n"
        "• Upload the generated XML file\n"
        "• Content imports with expandable sections and info panels\n"
    ),
    # unknown formats get the banner only (the reference's if/elif falls
    # through)
    "other": "\nConversion to OTHER complete!\n",
}

EXPECTED_SUMMARY = (
    "\n✅ Notion to SKOS conversion complete!\n\nConversion rules applied:\n"
    "- H1 headers → SKOS Concept Schemes\n"
    "- H2 headers → Top Concepts\n"
    "- H3+ headers → Narrower concepts with broader relationships\n"
    "- All concepts have skos:inScheme relationship\n"
    "- New concepts assigned UUID-based URIs\n"
    "- Missing definitions replaced with 'Lorem ipsum'\n"
)


def test_import_instructions_match_reference_stdout():
    for fmt, want in EXPECTED.items():
        assert "\n".join(import_instructions(fmt)) + "\n" == want, fmt


def test_skos_conversion_summary_matches_reference_stdout():
    assert "\n".join(skos_conversion_summary()) + "\n" == EXPECTED_SUMMARY
