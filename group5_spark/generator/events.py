"""Seeded StreamFlow-style event generator (SURVEY §2 A18-A20).

Re-expresses the reference producers' distributions and invariants
(``user_events_producer.py:66-100``, ``transaction_events_producer.py:
93-145``) as a deterministic, seedable generator that drives tests and
the end-to-end pipeline:

- user-event type weights: login .10 / logout .05 / page_view .20 /
  click .10 / search .10 / add_to_cart .30 / remove_from_cart .15
- conditional sparse fields per event type (search_query, element_id,
  product_id+quantity)
- transaction type weights purchase .85 / refund .12 / chargeback .03;
  status weights pending .05 / completed .88 / failed .05 / cancelled .02
- money invariants: subtotal = Σ qty×unit_price; tax = subtotal ×
  U(0.05,0.10) rounded 2dp; total = subtotal + tax; refund/chargeback
  totals negated and carrying original_transaction_id
- FK pools: user_id/product_id drawn from the generated dimensions so
  event↔dimension joins always hit (A20)

No Faker dependency: names/emails/ips are derived from the seeded RNG.
"""

from __future__ import annotations

import random
import uuid
from datetime import datetime, timedelta, timezone

EVENT_TYPES = [
    ("login", 0.10),
    ("logout", 0.05),
    ("page_view", 0.20),
    ("click", 0.10),
    ("search", 0.10),
    ("add_to_cart", 0.30),
    ("remove_from_cart", 0.15),
]
PAGES = ["/home", "/products", "/cart", "/checkout", "/search", "/account", "/deals", "/support"]
DEVICES = ["mobile", "desktop", "tablet"]
BROWSERS = ["chrome", "safari", "firefox", "edge"]
TXN_TYPES = [("purchase", 0.85), ("refund", 0.12), ("chargeback", 0.03)]
STATUSES = [("pending", 0.05), ("completed", 0.88), ("failed", 0.05), ("cancelled", 0.02)]
PAYMENT_METHODS = ["credit_card", "debit_card", "paypal", "apple_pay", "google_pay", "gift_card"]
CATEGORIES = ["electronics", "clothing", "home", "sports", "books", "toys"]
ACCOUNT_TYPES = ["free", "premium", "business"]
STATES = ["CA", "NY", "TX", "FL", "WA", "IL", "MA", "GA", "OH", "NC"]


def _weighted(rng: random.Random, pairs):
    values, weights = zip(*pairs)
    return rng.choices(values, weights=weights, k=1)[0]


def _uuid(rng: random.Random) -> str:
    return str(uuid.UUID(int=rng.getrandbits(128)))


def _iso(ts: datetime) -> str:
    # Producer format: 2026-01-09T01:02:40.276090Z
    return ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def make_customers(n: int = 1000, seed: int = 42) -> list[dict]:
    """Customer dimension (CUSTOMERS entity, SURVEY §1.2)."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        first = f"first{i}"
        last = f"last{rng.randrange(500)}"
        out.append(
            {
                "user_id": f"u{i:06d}",
                "email": f"{first}.{last}@example.com",
                "first_name": first,
                "last_name": last,
                "registration_date": (
                    datetime(2020, 1, 1) + timedelta(days=rng.randrange(1800))
                ).strftime("%Y-%m-%d"),
                "account_type": rng.choice(ACCOUNT_TYPES),
                "date_of_birth": (
                    datetime(1950, 1, 1) + timedelta(days=rng.randrange(20000))
                ).strftime("%Y-%m-%d"),
                "loyalty_points": rng.randrange(10000),
                "state": rng.choice(STATES),
            }
        )
    return out


def make_products(n: int = 2000, seed: int = 43) -> list[dict]:
    """Product dimension (PRODUCTS entity, SURVEY §1.2)."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        msrp = round(rng.uniform(5, 500), 2)
        out.append(
            {
                "product_id": f"p{i:06d}",
                "product_name": f"product {i}",
                "description": f"description of product {i}",
                "category": rng.choice(CATEGORIES),
                "subcategory": f"sub{rng.randrange(4)}",
                "brand": f"brand{rng.randrange(50)}",
                "manufacturer": f"mfg{rng.randrange(20)}",
                "msrp": msrp,
                "cost_price": round(msrp * rng.uniform(0.4, 0.8), 2),
                "created_date": (
                    datetime(2019, 1, 1) + timedelta(days=rng.randrange(2000))
                ).strftime("%Y-%m-%d"),
                "is_active": rng.random() < 0.9,
            }
        )
    return out


def make_user_events(
    n: int,
    customers: list[dict],
    products: list[dict],
    seed: int = 44,
    start: datetime | None = None,
) -> list[dict]:
    """User events with weighted types + conditional sparse fields
    (``user_events_producer.py:66-100``)."""
    rng = random.Random(seed)
    start = start or datetime(2026, 1, 1, tzinfo=timezone.utc)
    out = []
    for i in range(n):
        user = rng.choice(customers)
        etype = _weighted(rng, EVENT_TYPES)
        ev = {
            "event_id": _uuid(rng),
            "user_id": user["user_id"],
            "session_id": _uuid(rng)[:12],
            "event_type": etype,
            "timestamp": _iso(start + timedelta(seconds=i * 7 + rng.randrange(5))),
            "page": rng.choice(PAGES),
            "device": rng.choice(DEVICES),
            "browser": rng.choice(BROWSERS),
            "ip_address": f"{rng.randrange(1,255)}.{rng.randrange(255)}."
            f"{rng.randrange(255)}.{rng.randrange(1,255)}",
            "country": "US",
            "city": f"city{rng.randrange(100)}",
        }
        # Conditional fields — absent (not null) when inapplicable,
        # mirroring the producer's sparse JSON.
        if etype == "search":
            ev["search_query"] = f"query {rng.randrange(1000)}"
        elif etype == "click":
            ev["element_id"] = f"btn-{rng.randrange(50)}"
        elif etype in ("add_to_cart", "remove_from_cart"):
            ev["product_id"] = rng.choice(products)["product_id"]
            ev["quantity"] = rng.randint(1, 5)
        out.append(ev)
    return out


def make_transactions(
    n: int,
    customers: list[dict],
    products: list[dict],
    seed: int = 45,
    start: datetime | None = None,
) -> list[dict]:
    """Transactions with line items and the money invariants of
    ``transaction_events_producer.py:93-145``."""
    rng = random.Random(seed)
    start = start or datetime(2026, 1, 1, tzinfo=timezone.utc)
    out: list[dict] = []
    purchase_ids: list[str] = []
    for i in range(n):
        user = rng.choice(customers)
        ttype = _weighted(rng, TXN_TYPES)
        status = _weighted(rng, STATUSES)
        items = []
        subtotal = 0.0
        for _ in range(rng.randint(1, 5)):
            prod = rng.choice(products)
            qty = rng.randint(1, 5)
            unit_price = round(prod["msrp"] * (1 - rng.uniform(0, 0.15)), 2)
            subtotal += qty * unit_price
            items.append(
                {
                    "product_id": prod["product_id"],
                    "product_name": prod["product_name"],
                    "category": prod["category"],
                    "brand": prod["brand"],
                    "quantity": qty,
                    "unit_price": unit_price,
                }
            )
        subtotal = round(subtotal, 2)
        tax = round(subtotal * rng.uniform(0.05, 0.10), 2)
        total = round(subtotal + tax, 2)
        txn_id = _uuid(rng)
        txn = {
            "transaction_id": txn_id,
            "user_id": user["user_id"],
            "transaction_type": ttype,
            "timestamp": _iso(start + timedelta(seconds=i * 31 + rng.randrange(11))),
            "status": status,
            "payment_method": rng.choice(PAYMENT_METHODS),
            "currency": "USD",
            "subtotal": subtotal,
            "tax": tax,
            "total": total,
            "line_items": items,
            "billing_address": _address(rng),
            "shipping_address": _address(rng),
        }
        if ttype in ("refund", "chargeback"):
            # Negated total + back-reference
            # (transaction_events_producer.py:109-113,142-143).
            txn["total"] = -total
            if purchase_ids:
                txn["original_transaction_id"] = rng.choice(purchase_ids)
        else:
            purchase_ids.append(txn_id)
        out.append(txn)
    return out


def _address(rng: random.Random) -> dict:
    return {
        "street": f"{rng.randrange(1, 9999)} Main St",
        "city": f"city{rng.randrange(100)}",
        "state": rng.choice(STATES),
        "zip": f"{rng.randrange(10000, 99999)}",
        "country": "US",
    }
