#!/usr/bin/env python3
"""Deterministic Stripe-shaped NDJSON fixture generator (FIXTURES.md §A.1).

Writes fixtures/stripe_invoices.ndjson: one JSON invoice per line, shaped
exactly like graft.pipeline.Schemas.invoiceSchema. Seeded RNG → the file is
reproducible; it is checked in and used by the q46/q47 oracle queries, so
regenerate only if the schema itself changes.

Coverage (per FIXTURES.md): multi-line invoices, multi-currency, null
period.end (1-day fallback), zero-length periods, period_end before the
invoice date (empty expansion), empty lines arrays, inclusive/exclusive/empty
taxes, invoice-level vs line-level subscription fallback, non-paid invoices.
"""
import json
import random

random.seed(20240812)

OUT = "fixtures/stripe_invoices.ndjson"
N_INVOICES = 400
DAY = 86400
BASE = 1704067200  # 2024-01-01T00:00:00Z

CURRENCIES = ["USD", "EUR", "GBP"]
PERIOD_DAYS = [7, 14, 30, 30, 30, 90, 180, 365]


def line_item(inv_idx, li_idx, created, currency):
    li_id = f"li_{inv_idx:04d}_{li_idx}"
    amount = random.randint(500, 2_000_000)  # cents
    # period start within [created - 3d, created + 3d]
    p_start = created + random.randint(-3, 3) * DAY + random.randint(0, DAY - 1)
    shape = random.random()
    if shape < 0.06:
        p_end = None                      # missing → 1-day fallback
    elif shape < 0.10:
        p_end = p_start                   # zero-length period
    elif shape < 0.13:
        p_end = p_start - random.randint(1, 5) * DAY  # end before start
    else:
        p_end = p_start + random.choice(PERIOD_DAYS) * DAY
    n_taxes = random.choice([0, 0, 1, 1, 1, 2])
    taxes = [{"amount": random.randint(10, amount // 5 + 10),
              "tax_behavior": random.choice(["inclusive", "exclusive"])}
             for _ in range(n_taxes)]
    return {
        "id": li_id,
        "type": random.choice(["subscription", "invoiceitem"]),
        "description": random.choice(["monthly plan", "annual plan", "setup fee",
                                      "usage overage", "support addon"]),
        "amount": amount,
        "currency": currency if random.random() < 0.9 else None,
        "quantity": random.randint(1, 12),
        "subscription": f"sub_li_{inv_idx:04d}" if random.random() < 0.3 else None,
        "period": {"start": p_start, "end": p_end},
        "taxes": taxes,
        "metadata": {"plan": random.choice(["basic", "pro", "enterprise"])},
    }


def invoice(i):
    created = BASE + random.randint(0, 181 * DAY)
    currency = random.choice(CURRENCIES)
    status = "paid" if random.random() < 0.88 else random.choice(["open", "void", "draft"])
    n_lines = random.choices([0, 1, 2, 3, 4], weights=[4, 40, 30, 18, 8])[0]
    lines = [line_item(i, j, created, currency) for j in range(n_lines)]
    subtotal = sum(li["amount"] for li in lines)
    tax = sum(t["amount"] for li in lines for t in li["taxes"])
    return {
        "id": f"inv_{i:04d}",
        "customer": f"cus_{random.randint(1, 60):03d}",
        "subscription": f"sub_inv_{i:04d}" if random.random() < 0.6 else None,
        "status": status,
        "currency": currency,
        "created": created,
        "amount_due": subtotal + tax,
        "amount_paid": subtotal + tax if status == "paid" else 0,
        "amount_remaining": 0 if status == "paid" else subtotal + tax,
        "subtotal": subtotal,
        "total": subtotal + tax,
        "tax": tax,
        "collection_method": random.choice(["charge_automatically", "send_invoice"]),
        "period_start": created - random.randint(0, 30) * DAY,
        "period_end": created + random.randint(0, 30) * DAY,
        "automatic_tax": {"enabled": random.random() < 0.5,
                          "status": random.choice(["complete", None])},
        "metadata": {"source": random.choice(["checkout", "api", "dashboard"])},
        "lines": {"data": lines},
    }


def main():
    import os
    os.makedirs("fixtures", exist_ok=True)
    with open(OUT, "w") as f:
        for i in range(N_INVOICES):
            f.write(json.dumps(invoice(i), separators=(",", ":")) + "\n")
    print(f"wrote {N_INVOICES} invoices to {OUT}")


if __name__ == "__main__":
    main()
