// SPDX-License-Identifier: MIT
pragma solidity ^0.8.19;

import {Spectre} from "./Spectre.sol";

/// @title StepExternal — standalone public-input commitment recomputation
/// @notice The reference exposes the same function for the Rust/Solidity
///         equivalence test (step_input_encoding.rs:17-50); kept separate
///         so relayers can sanity-check calldata off the main contract.
contract StepExternal {
    function toPublicInputsCommitment(Spectre.StepInput calldata input)
        external pure returns (uint256)
    {
        bytes32 digest = sha256(abi.encodePacked(
            _le64(input.attestedSlot),
            _le64(input.finalizedSlot),
            _le64(input.participation),
            input.finalizedHeaderRoot,
            input.executionPayloadRoot));
        uint256 acc;
        for (uint256 i = 0; i < 32; i++) {
            acc |= uint256(uint8(digest[i])) << (8 * i);
        }
        return acc & ((uint256(1) << 253) - 1);
    }

    function _le64(uint64 v) private pure returns (bytes8 out) {
        for (uint256 i = 0; i < 8; i++) {
            out |= bytes8(bytes1(uint8(v >> (8 * i)))) >> (8 * i);
        }
    }
}
